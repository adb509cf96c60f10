package graft.knn

import graft.SparkTestBase
import graft.index.IvfIndex
import org.apache.spark.sql.functions._

/** Physical-plan regression checks: the scale story depends on these
  * plan shapes, not just on correct results (builder prompt: "the plan
  * you'd want, not the first one that passed"). */
class PlanSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private def q = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
  private def b = emb.filter(col("vec_id") >= 10)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("knnJoin: broadcast queries, partial top-k, base never shuffled") {
    val plan = Knn.knnJoin(q, b, 5).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"no broadcast NLJ:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"no object hash agg:\n$plan")
    assert(plan.toLowerCase.contains("partial_topk"), s"no partial top-k:\n$plan")
    // exactly one data shuffle: the k-rows-per-group final aggregation
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected 1 hash exchange, got $shuffles:\n$plan")
  }

  test("Index2Layer reconstruct is shuffle-free (broadcast centroid lookup + in-row decode)") {
    val idx = graft.index.TwoLayerIndex.build(b, "id", "vec",
      nlist = 4, m = 8, ksub = 16, niterCoarse = 2, niterPq = 2)
    val plan = idx.reconstruct.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 0, s"reconstruct must not shuffle, got $shuffles:\n$plan")
  }

  test("spectral-hash search: broadcast probes/thresholds, single top-k exchange") {
    val idx = graft.index.IvfSpectralHash.build(b, "id", "vec",
      nlist = 4, nbit = 16, period = 1.0, thresholdType = "global", niter = 2)
    val plan = idx.search(q, k = 5, nprobe = 2).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(plan.toLowerCase.contains("partial_topk"), s"no partial top-k:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected 1 hash exchange, got $shuffles:\n$plan")
  }

  test("window-rank filter gets the built-in WindowGroupLimit pushdown (no custom Rule needed)") {
    // SURVEY §7 listed an optional Rule rewriting row_number<=k to a
    // top-k aggregate; Spark 4's InferWindowGroupLimit already inserts
    // a per-partition group limit before the window sort, so SQL users
    // writing the window idiom get a bounded partial top-k natively —
    // we keep the (faster) heap aggregate for the API path and rely on
    // the built-in for the SQL idiom, per the built-ins-first doctrine.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("label")).orderBy(col("vec_id"))
    val plan = emb.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$plan")
  }

  test("chunk_documents is a narrow map: zero exchanges") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val plan = graft.llm.Corpus.chunk(docs, "doc_id", "text", 64, 16)
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange".r.findAllIn(plan).length
    assert(shuffles == 0, s"chunking must not shuffle, got $shuffles:\n$plan")
  }

  test("decontamination is an equi-join, never a cartesian/BNLJ") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val plan = graft.llm.Corpus.contaminated(
      docs.filter(col("doc_id") % 7 =!= 0), docs.filter(col("doc_id") % 7 === 0),
      "doc_id", "text", ngram = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in plan:\n$plan")
  }

  test("base-side id filter is pushed to the parquet scan") {
    // other suites may have cached this very parquet read; the scan
    // shape only exists against the raw relation
    spark.catalog.clearCache()
    val df = Knn.knnJoin(q, b, 5, filter = Some(col("id").between(100, 299)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(vec_id,100)"),
      s"filter not pushed:\n$plan")
  }

  test("projection pruning: only vec_id and embedding are read") {
    spark.catalog.clearCache()
    val plan = Knn.knnJoin(q, b, 5).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("label"), "label column should be pruned from scan")
  }

  test("persisted IVF search reads only the probed list_no partitions") {
    val idx = IvfIndex.build(b, "id", "vec", nlist = 8, niter = 3)
    val dir = java.nio.file.Files.createTempDirectory("ivfplan").toString
    idx.save(dir)
    val loaded = IvfIndex.load(spark, dir)
    val oneQuery = q.limit(1)
    val lists = loaded.probedListNos(oneQuery, 2)
    val probed = loaded.invlists
      .filter(col("list_no").isin(lists.map(Integer.valueOf): _*))
    // inputFiles ignores filters; count selected partitions from the scan
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("list_no"), s"no partition filter on list_no:\n$plan")
    val scanned = probed.select(col("list_no")).distinct().count()
    assert(scanned <= lists.length, s"scanned $scanned lists for ${lists.length} probes")
  }

  test("session-built (cached) IVF search pushes the probed-list INSET into the scan") {
    // the *_big queries search a memory-persisted session index: the
    // probed list_no filter must reach the InMemoryTableScan (the
    // cached-index analog of parquet PartitionFilters — that shape is
    // pinned by the persisted-IVF test above). EXPLAIN.md captures the
    // same shape at sf0.01 (r05 finding: the sections were degenerate
    // LocalTableScan <empty> because the sf0.001 query set is empty).
    val idx = IvfIndex.build(b, "id", "vec", nlist = 8, niter = 3)
    idx.invlists.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
    try {
      val plan = idx.search(q, k = 5, nprobe = 2).queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"), s"no cached scan:\n$plan")
      assert("list_no#\\d+ IN".r.findFirstIn(plan).isDefined,
        s"probed-list filter not pushed into the cached scan:\n$plan")
      assert(plan.toLowerCase.contains("partial_topk"), s"no partial top-k:\n$plan")
    } finally idx.invlists.unpersist()
  }

  test("fast-scan search keeps the flat-scan shape: broadcast LUTs, partial top-k, one exchange") {
    val fs = graft.index.Pq4FastScanIndex.build(b, "id", "vec", m = 8, niter = 2)
    val plan = fs.search(q, 5).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"queries+LUTs not broadcast:\n$plan")
    assert(plan.toLowerCase.contains("partial_topk"), s"no partial top-k:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected 1 hash exchange, got $shuffles:\n$plan")
  }

  test("IVF fast-scan pushes the probed-list filter below the broadcast probe join") {
    val ivf = graft.index.IvfPq4FastScanIndex.build(b, "id", "vec", nlist = 8,
      m = 8, niterCoarse = 2, niterPq = 2)
    val plan = ivf.search(q, 5, nprobe = 2).queryExecution.executedPlan.toString
    assert("list_no(#\\d+)? IN \\(".r.findFirstIn(plan).isDefined,
      s"probed-list filter not pushed:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"probe table not broadcast:\n$plan")
    assert(plan.toLowerCase.contains("partial_topk"), s"no partial top-k:\n$plan")
  }

  test("IMI+PQ search: probed-cell filter pushed, probes broadcast, partial top-k") {
    val idx = graft.index.ImiPqIndex.build(b, "id", "vec", ksub = 4,
      m = 8, pqKsub = 16, niterCoarse = 2, niterPq = 2)
    // the MinSumK probe subplan makes this tree longer than the
    // session's 8192-char render budget — the codes-scan node (where
    // the pushed filter lives) would be truncated away
    val prev = spark.conf.get("spark.sql.maxPlanStringLength")
    spark.conf.set("spark.sql.maxPlanStringLength", "262144")
    val plan =
      try idx.search(q, 5, nprobe = 4).queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.maxPlanStringLength", prev)
    // static cell pruning below the probe join (the 100 TB claim: the
    // codes scan touches only the probed cells); Spark renders small
    // in-lists as `IN (...)` and larger ones as `INSET ...`
    assert("cell(#\\d+)? IN(SET)?[ (]".r.findFirstIn(plan).isDefined,
      s"probed-cell filter not pushed:\n$plan")
    // the LUT/qcode-bearing probe table ships as a broadcast, and the
    // MinSumK probe selection never materializes a K²-row cell table
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"probe table not broadcast:\n$plan")
    assert(plan.toLowerCase.contains("partial_topk"), s"no partial top-k:\n$plan")
  }

  test("big-batch IVF search (broadcastQueries=false): the probe join survives " +
    "as a shuffle equi-join when broadcast is disabled, results unchanged") {
    // ivf_search_big_batch's 100x-scale claim must be a demonstrated
    // plan, not an AQE-threshold argument (VERDICT r12): with both
    // broadcast thresholds off, the distributed-probe variant must
    // plan a SortMergeJoin/ShuffledHashJoin on list_no — the shape a
    // corpus-sized query table needs — and return exactly the rows
    // the broadcast plan returns.
    val idx = IvfIndex.build(b, "id", "vec", nlist = 4, niter = 2)
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      val viaBroadcast = idx.search(q, 5, nprobe = 2).collect().toSet
      saved.foreach { case (k, _) => conf.set(k, "-1") }
      val dist = idx.search(q, 5, nprobe = 2, broadcastQueries = false)
      val plan = dist.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"probe join did not survive as a shuffle equi-join:\n$plan")
      assert(!plan.contains("BroadcastHashJoin"),
        s"unexpected broadcast under threshold=-1:\n$plan")
      assert(dist.collect().toSet == viaBroadcast,
        "distributed-probe results differ from the broadcast plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("big-batch IVF search runs ONE probe-assign: plan construction launches no job " +
    "(VERDICT r13 #1)") {
    // With broadcastQueries=false the query set is corpus-sized: the
    // old static-prune collect ran a full coarse-quantization job
    // inside the plan builder and then recomputed the probe table in
    // the join. The fixed path must build the plan lazily — zero Spark
    // jobs before the caller's action — so the probe assignment runs
    // exactly once, inside the shuffle equi-join.
    val idx = IvfIndex.build(b, "id", "vec", nlist = 4, niter = 2)
    // ensure the fixture caches are warm so the count below is exact
    idx.invlists.count()
    val sc = spark.sparkContext
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    sc.addSparkListener(listener)
    try {
      val df = idx.search(q, 5, nprobe = 2, broadcastQueries = false,
        maxCodes = Some(1000))
      val pre = idx.searchPreassigned(q,
        df.select(col("qid"), lit(0).as("list_no")), k = 5,
        broadcastProbes = false)
      assert(pre.columns.nonEmpty) // plans built, never executed
      // flush the async listener bus with a sentinel job (RDD action =
      // exactly one job, no AQE), then assert it is the ONLY job seen
      sc.parallelize(Seq(1), 1).count()
      val deadline = System.nanoTime() + 5000000000L
      while (jobs.get() < 1 && System.nanoTime() < deadline) Thread.sleep(20)
      assert(jobs.get() == 1,
        s"plan construction launched ${jobs.get() - 1} eager Spark job(s)")
    } finally sc.removeSparkListener(listener)
  }

  test("assign uses the heap aggregate (no window, no sort aggregate)") {
    val plan = Knn.assign(q, b).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "assign must not use a window sort")
    assert(!plan.contains("SortAggregate"), s"sort aggregate in assign:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"expected object hash agg:\n$plan")
  }

  test("kmeans subsample never plans a global sort/TakeOrdered (VERDICT r02 #4)") {
    val spark0 = spark
    import spark0.implicits._
    // force the subsample path: n > k * maxPointsPerCentroid
    val vecs = (0 until 3000)
      .map(i => Seq.fill(4)((i % 97).toFloat)).toDF("vec")
      .select(col("vec").cast("array<float>").as("vec"))
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans += qe.executedPlan.toString
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
    }
    spark0.listenerManager.register(listener)
    try {
      graft.cluster.KMeans.fit(vecs, "vec",
        graft.cluster.KMeans.Params(k = 4, niter = 2, maxPointsPerCentroid = 100))
      // listener delivery is async; poll briefly for the last plans
      Thread.sleep(1500)
      // the k-row init TakeOrdered is fine (k rows); a TakeOrdered over
      // the SAMPLE (maxTrain rows through the driver) is the
      // scale-killer — assert no job sorts more than the k init rows
      val bad = plans.filter(p =>
        p.contains("TakeOrderedAndProject") && !p.contains("limit=4,"))
      assert(bad.isEmpty,
        s"subsample planned a non-init TakeOrdered:\n${bad.headOption.getOrElse("")}")
    } finally spark0.listenerManager.unregister(listener)
  }
}
