package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet").cache()

  test("exact dedup on doubled corpus: every group has exactly 2 instances") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val doubled = e.unionByName(
      e.select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val groups = Dedup.exactDupGroups(doubled, "vec_id", col("embedding"))
    assert(groups.count() == 500)
    assert(groups.filter(col("cnt") =!= 2).count() == 0)
    val survivors = Dedup.dropExactDups(doubled, "vec_id", col("embedding"))
    assert(survivors.count() == 500)
    assert(survivors.filter(col("vec_id") >= 10000).count() == 0) // min id wins
  }

  test("minhash LSH candidates contain all very-near duplicates") {
    // ground truth: pairs with 3-gram jaccard >= 0.9 (planted dups)
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.9, 3)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "testdata should contain planted near-dups")
    val found = Dedup.nearDupPairs(docs, "doc_id", "text", 0.9, 3, 12, 4)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // at jaccard >= 0.9 with 4 bands of 3, candidate recall is ~0.995
    assert(truth.subsetOf(found) || (truth -- found).size <= 1,
      s"missed ${truth -- found}")
  }

  test("hot-bucket cap drops pairs from oversized buckets, keeps small-bucket pairs") {
    import spark.implicits._
    // 5 identical docs (every band bucket has all 5 — size 5) and one
    // identical pair (bucket size 2): cap=3 must eliminate the clique
    // and keep the pair
    val corpus = ((1L to 5L).map(i => (i, "alpha beta gamma delta epsilon zeta")) ++
      Seq((10L, "one two three four five six"),
        (11L, "one two three four five six"),
        (20L, "lone wolf document with no duplicate anywhere here")))
      .toDF("doc_id", "text")
    val uncapped = Dedup.nearDupPairs(corpus, "doc_id", "text", 0.9, 3, 12, 4)
    val capped = Dedup.nearDupPairs(corpus, "doc_id", "text", 0.9, 3, 12, 4,
      maxBucket = 3)
    val u = uncapped.select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val c = capped.select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(u.contains((1L, 2L)) && u.contains((10L, 11L)), s"uncapped: $u")
    assert(c == Set((10L, 11L)), s"capped must keep ONLY the size-2 bucket pair: $c")
    Dedup.release(uncapped); Dedup.release(capped)
  }

  test("nearDupPairs leaves only its result cached; release empties the cache manager") {
    spark.catalog.clearCache()
    assert(spark.sharedState.cacheManager.isEmpty, "precondition: empty cache")
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", 0.9, 3, 12, 4)
    // the returned pair set is cached, every intermediate already freed
    assert(pairs.storageLevel.useMemory || pairs.storageLevel.useDisk)
    Dedup.release(pairs)
    assert(spark.sharedState.cacheManager.isEmpty,
      "cache manager must be empty after release (no leaked intermediates)")
    // docs is a shared fixture other tests rely on — re-cache it
    docs.cache().count()
  }

  test("pairJaccard equals the inverted-index computation") {
    val pairs = Dedup.minhashLshCandidates(docs, "doc_id", "text", 3, 12, 4)
    val viaSets = Dedup.pairJaccard(pairs, docs, "doc_id", "text", 3)
      .filter(col("jaccard") >= 0.5)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaIndex = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5, 3)
      .join(pairs, Seq("i", "j"), "left_semi")
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSets == viaIndex)
  }

  test("simhash near-dups include the planted duplicates") {
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.95, 3)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 10)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // simhash of near-identical token multisets should be within a few bits
    assert(truth.intersect(sh).size >= truth.size / 2,
      s"simhash found ${truth.intersect(sh).size} of ${truth.size}")
  }

  test("chunked simhash LSH is pigeonhole-complete: equals brute force for maxHamming < chunks") {
    import org.apache.spark.sql.functions._
    val codes = docs
      .select(col("doc_id"),
        graft.functions.simhash64(graft.llm.TextFunctions.tokenize(col("text"))).as("sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (i, a) <- codes; (j, b) <- codes
      if i < j && java.lang.Long.bitCount(a ^ b) <= 7
    } yield (i, j)).toSet
    val lsh = Dedup.simhashNearDups(docs, "doc_id", "text",
      maxHamming = 7, chunks = 8)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brute, s"lsh ${lsh.size} pairs != brute ${brute.size}")
  }

  test("connected components group chains; dedup is idempotent") {
    import spark.implicits._
    // chain 1-2-3 and pair (10, 11): components {1,2,3} and {10,11}
    val ids = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("i", "j")
    val comp = Dedup.nearDupComponents(ids, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L)
    assert(comp(10L) == 10L && comp(11L) == 10L)
    assert(comp(99L) == 99L)

    // idempotence on the real corpus: dedup of the deduped corpus
    // finds no remaining near-dup pairs
    val survivors = Dedup.dropNearDups(docs, "doc_id", "text", 0.8)
    val again = Dedup.nearDupPairs(survivors, "doc_id", "text", 0.8)
    assert(again.count() == 0, "dedup not idempotent")
  }

  test("embedding near-dups on doubled corpus are exactly the planted copies") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val doubled = e.unionByName(
      e.select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val pairs = Dedup.embeddingNearDups(doubled, "vec_id", "embedding", 0.99)
    assert(pairs.count() == 500)
    assert(pairs.filter(col("j") - col("i") =!= 10000).count() == 0)
  }

  test("SemDeDup within-cell near-dups: finds every planted pair, never a non-pair") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val doubled = e.unionByName(
      e.select((col("vec_id") + 10000).as("vec_id"), col("embedding"))).cache()
    val cents = graft.cluster.KMeans.fit(doubled.select(col("embedding")),
      "embedding",
      graft.cluster.KMeans.Params(k = 32, niter = 4, seed = 1234L)).centroids
    val cells = Dedup.embeddingNearDupsWithinCells(
      doubled, "vec_id", "embedding", 0.99, cents).cache()
    // planted exact dups have IDENTICAL vectors, so they assign to the
    // same cell by construction — the within-cell form finds all 500
    assert(cells.filter(col("j") - col("i") === 10000).count() == 500)
    // and reports nothing the exact form would not (within-cell pairs
    // are a subset of all pairs; the cosine verify is the same)
    val exact = Dedup.embeddingNearDups(doubled, "vec_id", "embedding", 0.99)
    assert(cells.select("i", "j").except(exact.select("i", "j")).isEmpty)
    // caller-owned release contract (ADVICE r17): both operators
    // return persisted pair sets
    Dedup.release(cells)
    Dedup.release(exact)
  }

  test("within-cells executes the NearestCentroid assignment exactly once " +
    "(VERDICT r16 #1: the self-join must read the persisted table, not " +
    "re-derive assignment per side)") {
    val spark0 = spark
    val e = spark0.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val doubled = e.unionByName(
      e.select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val cents = graft.cluster.KMeans.fit(doubled.select(col("embedding")),
      "embedding",
      graft.cluster.KMeans.Params(k = 16, niter = 2, seed = 1234L)).centroids
    val plans = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.execution.SparkPlan]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan; () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          ex: Exception): Unit = ()
    }
    // full tree incl. AQE/stage/reuse wrappers (their children live in
    // fields TreeNode traversal does not descend into); InMemoryRelation
    // is deliberately NOT descended — computation behind the cache is
    // the materialize-once path this test distinguishes from inline
    // recomputation
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      import org.apache.spark.sql.execution.adaptive._
      import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case qs: QueryStageExec => Seq(qs.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      p +: kids.flatMap(allNodes)
    }
    spark0.listenerManager.register(listener)
    try {
      val out = Dedup.embeddingNearDupsWithinCells(
        doubled, "vec_id", "embedding", 0.99, cents)
      assert(out.filter(col("j") - col("i") === 10000).count() == 500)
      // listener delivery is async: poll until non-empty and stable
      // (the FastScanSpec pattern)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var last = -1
      while (System.nanoTime() < deadline &&
          (plans.synchronized(plans.isEmpty) ||
            plans.synchronized(plans.size) != last)) {
        last = plans.synchronized(plans.size)
        Thread.sleep(100)
      }
      val snap = plans.synchronized(plans.toVector)
      assert(snap.nonEmpty, "listener never delivered any executed plan")
      val nodes = snap.flatMap(allNodes)
      // NO executed plan computes the assignment INLINE: the only
      // NearestCentroid evaluation is the materialize-once pass behind
      // the persisted table. Pre-fix, the self-join planned TWO inline
      // assignment subtrees (one per join side) and this count was > 0.
      val inline = nodes.map(n => n.expressions.map(
        _.collect { case _: graft.core.NearestCentroid => 1 }.sum).sum).sum
      assert(inline == 0,
        s"join recomputes the NearestCentroid assignment inline ($inline occurrences)")
      // and both join sides read the persisted assignment back — the
      // join itself must be a shuffle on list_no, never a corpus
      // broadcast (the only shape that survives 100 TB). The returned
      // pairs are themselves persisted, so the join plan lives behind
      // out's InMemoryRelation: unwrap it and inspect the cached plan.
      import org.apache.spark.sql.execution.columnar.{
        InMemoryRelation, InMemoryTableScanExec}
      import org.apache.spark.sql.execution.joins._
      assert(nodes.exists(_.isInstanceOf[InMemoryTableScanExec]),
        "no plan reads a persisted table")
      val cachedJoinPlan = allNodes(out.queryExecution.executedPlan)
        .collect { case s: InMemoryTableScanExec => s.relation }
        .collectFirst { case r: InMemoryRelation => r.cachedPlan }
        .getOrElse(fail("returned pairs are not persisted"))
      val joinNodes = allNodes(cachedJoinPlan)
      val joins = joinNodes.collect { case j: BaseJoinExec => j }
      assert(joins.exists {
        case _: ShuffledHashJoinExec | _: SortMergeJoinExec => true
        case _ => false
      }, s"no shuffle join on list_no found: ${joins.map(_.nodeName)}")
      assert(!joins.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        "within-cell self-join was planned as a corpus broadcast")
      // both join inputs read the ONE persisted assignment, and the
      // join plan computes no assignment of its own
      assert(joinNodes.count(_.isInstanceOf[InMemoryTableScanExec]) >= 2,
        "join sides do not both read the persisted assignment table")
      val joinInline = joinNodes.map(n => n.expressions.map(
        _.collect { case _: graft.core.NearestCentroid => 1 }.sum).sum).sum
      assert(joinInline == 0,
        "join plan re-derives the assignment instead of reading the cache")
      Dedup.release(out)
    } finally spark0.listenerManager.unregister(listener)
  }

  test("semantic dedup composes over within-cell pairs: keep-one-per-component " +
    "with no quadratic pair source (VERDICT r16 #2)") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val doubled = e.unionByName(
      e.select((col("vec_id") + 10000).as("vec_id"), col("embedding"))).cache()
    val n = doubled.count()
    val cents = graft.cluster.KMeans.fit(doubled.select(col("embedding")),
      "embedding",
      graft.cluster.KMeans.Params(k = 32, niter = 4, seed = 1234L)).centroids
    val pairs = Dedup.embeddingNearDupsWithinCells(
      doubled, "vec_id", "embedding", 0.99, cents)
    val kept = Dedup.nearDupComponents(doubled.select(col("vec_id")), pairs, "vec_id")
      .select(col("component")).distinct()
    // planted dups are exact copies (same cell by construction), so the
    // 500 {i, i+10000} pairs collapse to components keeping the low id;
    // everything else is a singleton: n - 500 representatives, none of
    // them a high-id planted copy
    assert(kept.count() == n - 500)
    assert(kept.filter(col("component") >= 10000).count() == 0)
    Dedup.release(pairs)
    doubled.unpersist(false)
  }

  test("embedding blocking candidate count grows sub-quadratically under auto nlist") {
    // VERDICT r06 finding #4: a FIXED nlist makes the within-cell join
    // O(n²/const) at corpus scale. With nlist = max(16, ceil(sqrt(n)))
    // cells are O(sqrt(n)) wide, so candidates are ~n^1.5·fanout:
    // quadrupling n must multiply candidates by far less than the 16x
    // a quadratic bound would give.
    // Clusterable corpus (what real embeddings look like — radius
    // blocking cannot prune isotropic random noise, where every cell
    // radius rivals the inter-centroid distance): sqrt(n) planted
    // cluster centers, points = center + small noise.
    import spark.implicits._
    def corpus(n: Int) = {
      val rnd = new scala.util.Random(42)
      val nc = math.ceil(math.sqrt(n.toDouble)).toInt
      val centers = Array.fill(nc)(Array.fill(16)(rnd.nextGaussian().toFloat))
      (0 until n).map { i =>
        val c = centers(i % nc)
        (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
      }.toDF("vec_id", "embedding").repartition(8)
    }
    def candCount(n: Int): Long = {
      val (cand, assigned) = Dedup.embeddingCandidates(
        corpus(n), "vec_id", "embedding", threshold = 0.95)
      val c = cand.count()
      assigned.unpersist(false)
      c
    }
    val c1 = candCount(500)
    val c4 = candCount(2000)
    // sub-quadratic: the n^1.5 blocking bound predicts ~8x for a 4x n
    // increase; quadratic would be 16x. 12x splits the difference with
    // headroom for cell imbalance.
    assert(c4 < 12L * c1,
      s"candidates grew ~quadratically: n=500 -> $c1, n=2000 -> $c4")
  }

  test("autoMinhashParams: rows-per-band grows with log(n), bands keep the " +
    "S-curve midpoint at the threshold (VERDICT r18 #2)") {
    // pinned derivations at three corpus decades, threshold 0.8,
    // background Jaccard 0.1, <=1 expected false candidate per doc:
    // n*b*s0^r <= 1 picks r, then b = round((1/t)^r) re-pins the
    // S-curve midpoint (1/b)^(1/r) at ~t
    assert(Dedup.autoMinhashParams(100000L, 0.8) == (24, 4))    // r=6
    assert(Dedup.autoMinhashParams(10000000L, 0.8) == (48, 6))  // r=8
    assert(Dedup.autoMinhashParams(1000000000L, 0.8) == (90, 9)) // r=10
    // invariants across a wide sweep: r monotone non-decreasing in n,
    // the midpoint stays within a band-rounding step of the threshold,
    // and the false-candidate expectation is actually met
    var lastR = 0
    for (exp10 <- 3 to 11) {
      val n = math.pow(10, exp10).toLong
      val (hashes, bands) = Dedup.autoMinhashParams(n, 0.8)
      val r = hashes / bands
      assert(hashes % bands == 0, s"n=$n: $hashes % $bands != 0")
      assert(r >= lastR, s"rows-per-band fell at n=$n: $r < $lastR")
      lastR = r
      val midpoint = math.pow(1.0 / bands, 1.0 / r)
      assert(math.abs(midpoint - 0.8) < 0.05,
        s"n=$n: S-curve midpoint $midpoint drifted off threshold 0.8")
      val falseExp = n.toDouble * bands * math.pow(0.1, r)
      assert(falseExp <= 1.0,
        s"n=$n: expected false candidates per doc $falseExp > 1")
    }
    // the auto wrapper still finds the planted near-dups on the
    // fixture corpus (the derived params change recall shape, not
    // verification: verify is exact Jaccard either way)
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.9, 3)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = Dedup.nearDupPairsAuto(docs, "doc_id", "text", 0.9)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.subsetOf(auto) || (truth -- auto).size <= 1,
      s"auto params missed ${truth -- auto}")
  }

  test("nearDupPairs verify runs the sorted-long kernel, never string " +
    "array_intersect (VERDICT r18 #5: the 43x-cheaper path is pinned " +
    "by plan, not by convention)") {
    // the returned pair set is persisted, so the verify-join plan
    // lives behind the InMemoryRelation — unwrap and inspect it, the
    // within-cells test's pattern
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      import org.apache.spark.sql.execution.adaptive._
      import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
      import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case qs: QueryStageExec => Seq(qs.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        // DO descend into nested caches here (unlike the within-cells
        // test): the assertion is "no array_intersect ANYWHERE on the
        // operator's path", including behind intermediate persists
        case s: InMemoryTableScanExec => Seq(s.relation.cachedPlan)
        case other => other.children
      }
      p +: kids.flatMap(allNodes)
    }
    val out = Dedup.nearDupPairs(docs, "doc_id", "text", 0.8, 3, 12, 4)
    val nodes = allNodes(out.queryExecution.executedPlan)
    def exprCount(pred: PartialFunction[
        org.apache.spark.sql.catalyst.expressions.Expression, Int]): Int =
      nodes.map(_.expressions.map(_.collect(pred).sum).sum).sum
    val kernel = exprCount { case _: graft.core.SortedLongIntersectK => 1 }
    val strInter = exprCount {
      case _: org.apache.spark.sql.catalyst.expressions.ArrayIntersect => 1 }
    assert(kernel >= 1,
      "verify plan does not use the SortedLongIntersectK merge kernel")
    assert(strInter == 0,
      s"verify plan contains $strInter array_intersect evaluation(s) — " +
        "the 43x-slower string form must stay oracle-only (pairJaccard)")
    Dedup.release(out)
  }
}
