package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim
import graft.core.{Metric, TopKAgg}
import graft.cluster.KMeans
import graft.functions.{topk, vec_dist}
import graft.io.JsonSidecar
import graft.io.JsonSidecar.SidecarWriter

/** IVF (inverted-file) index: the reference's scale path
  * (faiss/IndexIVF.cpp) re-expressed as a list_no-partitioned
  * DataFrame plus a small centroid table.
  *
  * Build = k-means on a subsample + assign + repartition by list_no
  * (IndexIVF::train / add_core, IndexIVF.cpp:254). Search = per-query
  * coarse quantization to nprobe lists (broadcast-size centroid table
  * embedded in the plan) + equi-join on list_no against only the
  * probed lists + per-query top-k (IndexIVF::search,
  * IndexIVF.cpp:302-683). With parquet persistence partitioned on
  * list_no, the probe filter becomes static partition pruning: at
  * 100 TB the scan touches nprobe/nlist of the data, which is the
  * whole point of IVF.
  */
class IvfIndex(
    val d: Int,
    val metric: String,
    val nlist: Int,
    val centroids: Array[Array[Float]],
    /** (id: long, vec: array<float>, list_no: int) */
    val invlists: DataFrame) {

  import IvfIndex._

  /** Stable id for the executor-side graph coarse-quantizer cache:
    * every task of every search over THIS index reuses one graph. */
  private val graphCacheKey = java.util.UUID.randomUUID().toString

  /** Per-query probe lists: (qid, qvec, list_no, coarse_dist).
    * `coarse = Some(HnswCoarse/NsgCoarse)` routes the coarse
    * quantization through a per-executor graph walk over the
    * centroids (the reference's `IVF{n}_HNSW{m}` / `IVF{n}_NSG{R}`
    * coarse grammar) — the scale path when nlist is large enough that
    * the exact O(nlist) argmin per row dominates; budget >= nlist
    * degenerates to exact. */
  private def probes(queries: DataFrame, nprobe: Int,
      queryId: String, queryVec: String,
      coarse: Option[Probes.CoarseQuant] = None): DataFrame = {
    val sel = Probes.selExpr(col(queryVec), centroids, nprobe, metric,
      coarse, graphCacheKey)
    queries.select(col(queryId), col(queryVec),
      posexplode(sel).as(Seq("_pr", "_p")))
      .select(col(queryId), col(queryVec),
        col("_p.list_no").as("list_no"), col("_p.dist").as("coarse_dist"),
        // 0-based probe rank (closest centroid first): lets a sweep
        // reconstruct the nprobe=j candidate set as `pr < j`
        col("_pr").as("pr"))
  }

  /** Distinct lists any query probes at this nprobe (the scan set). */
  def probedListNos(queries: DataFrame, nprobe: Int,
      queryId: String = "qid", queryVec: String = "qvec",
      coarse: Option[Probes.CoarseQuant] = None): Array[Int] =
    probes(queries, nprobe, queryId, queryVec, coarse)
      .select("list_no").distinct().collect().map(_.getInt(0))

  /** Each probed list's minimum probe rank over the query set at
    * nprobe=npMax — reconstructs the probed-list union of ANY smaller
    * nprobe (list in scan set at np iff min rank < np) without
    * re-running the coarse quantization per operating point. */
  def probedListMinRank(queries: DataFrame, npMax: Int,
      queryId: String = "qid", queryVec: String = "qvec"): Array[(Int, Int)] =
    probes(queries, npMax, queryId, queryVec)
      .groupBy("list_no").agg(min(col("pr")).as("_pr"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))

  /** max_codes probe-budget filter (IndexIVF::search_preassigned,
    * faiss/IndexIVF.cpp:586: `nscan` accumulates WHOLE scanned lists
    * in probe-rank order and the scan breaks once nscan >= max_codes)
    * — a per-query TOTAL budget, so the list at probe rank r is
    * scanned iff the RAW sizes of the better-ranked lists sum below
    * the budget. Sizes are pre-IDSelector (the reference counts
    * invlists->list_size, not surviving candidates). Expressed as a
    * probe-table prefilter: whole lists are cut before the scan join
    * — at scale this PRUNES partitions, where a per-candidate cap
    * would add an aggregate over every scanned code. */
  private def budgetProbes(pr: DataFrame, listsRaw: DataFrame, mc: Int,
      queryId: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sizes = listsRaw.groupBy("list_no").agg(count(lit(1)).as("_lsz"))
    // pr is unique per (query, list), so the running-sum frame is
    // well-defined; probed-but-empty lists carry size 0
    val w = Window.partitionBy(col(queryId)).orderBy(col("pr"))
    pr.join(sizes, Seq("list_no"), "left")
      .withColumn("_csz", coalesce(col("_lsz"), lit(0L)))
      .withColumn("_before", sum(col("_csz")).over(w) - col("_csz"))
      .filter(col("_before") < mc)
      .drop("_lsz", "_csz", "_before")
  }

  /** kNN search over the probed lists (search_preassigned,
    * faiss/IndexIVF.cpp:398-683). Output (qid, rank, id, dist).
    * `filter` = IDSelector pushed inside the scan (IndexIVF.h:377).
    * `maxCodes` = the per-query TOTAL scan budget consumed in
    * probe-rank order (faiss/IndexIVF.h:67-72; see [[budgetProbes]]). */
  /** @param broadcastQueries true (default) broadcasts the probe table
    *        (small query sets); false leaves it to a shuffle equi-join
    *        on list_no — the right plan when the query set itself is
    *        huge (e.g. a full-corpus self-join for dedup). Partition
    *        pruning applies either way. */
  def search(queries: DataFrame, k: Int, nprobe: Int,
      queryId: String = "qid", queryVec: String = "qvec",
      filter: Option[Column] = None,
      maxCodes: Option[Int] = None,
      withCentroid: Boolean = false,
      broadcastQueries: Boolean = true,
      coarse: Option[Probes.CoarseQuant] = None): DataFrame = {
    val pr0 = probes(queries, nprobe, queryId, queryVec, coarse)
    // Small query sets (broadcastQueries=true): the probed-list set is
    // tiny (≤ queries × nprobe ints), so collecting it turns the
    // invlists scan into a statically partition-pruned read — worth one
    // cheap pass over the small query table. Big-batch sets
    // (broadcastQueries=false, corpus-sized queries): the probed union
    // approaches every list, the isin would prune nothing, and the
    // collect would force an eager full coarse-quantization job inside
    // a plan builder AND recompute it in the join — so the scan set is
    // left entirely to the shuffle equi-join (unprobed lists drop out
    // of the join; parquet partition pruning on list_no still applies
    // dynamically). Plan construction launches ZERO jobs on this path
    // (PlanSpec pins it).
    def pruneLists(pr: DataFrame): DataFrame =
      if (!broadcastQueries) invlists
      else {
        val probed = pr.select("list_no").distinct().collect().map(_.getInt(0))
        invlists.filter(col("list_no").isin(probed.map(Integer.valueOf): _*))
      }
    val listsRaw = pruneLists(pr0)
    val pr = maxCodes.map(budgetProbes(pr0, listsRaw, _, queryId)).getOrElse(pr0)
    // re-prune after the budget cut: lists past the budget drop out of
    // the scan set entirely
    val lists0 = if (maxCodes.isDefined) pruneLists(pr) else listsRaw
    val lists = filter.map(lists0.filter).getOrElse(lists0)
    val prSide = if (broadcastQueries) broadcast(pr) else pr
    val cand = lists.join(prSide, "list_no")
      .select(col(queryId), col("list_no"), col("id"),
        vec_dist(col(queryVec), col("vec"), metric).as("_dist"))
    val agg =
      if (withCentroid) {
        // search_and_return_centroids (faiss/IVFlib.h:74): carry list_no
        // through the top-k by packing it into the id (id * nlist + list)
        val packed = cand.select(col(queryId),
          (col("id") * nlist + col("list_no")).as("_pid"), col("_dist"))
        packed.groupBy(col(queryId))
          .agg(topk(col("_dist"), col("_pid"), k, Metric.ascending(metric)).as("_tk"))
          .select(col(queryId), posexplode(col("_tk")).as(Seq("_pos", "_r")))
          .select(col(queryId), (col("_pos") + 1).cast("long").as("rank"),
            // integer floor-div/mod round-trip: `/` is double division
            // and loses precision for id*nlist near 2^53
            expr(s"_r.id div $nlist").cast("long").as("id"),
            pmod(col("_r.id"), lit(nlist.toLong)).cast("int").as("list_no"),
            col("_r.dist").as("dist"))
      } else {
        cand.groupBy(col(queryId))
          .agg(topk(col("_dist"), col("id"), k, Metric.ascending(metric)).as("_tk"))
          .select(col(queryId), posexplode(col("_tk")).as(Seq("_pos", "_r")))
          .select(col(queryId), (col("_pos") + 1).cast("long").as("rank"),
            col("_r.id").as("id"), col("_r.dist").as("dist"))
      }
    agg
  }

  /** search_preassigned with CALLER-PROVIDED probe assignments
    * (faiss/IndexIVF.h:377 — the quantizer-already-ran entry point
    * used by IVFlib's big-batch search and index-merge tooling). The
    * coarse quantization step is skipped entirely: `probesDf` is a
    * (queryId, list_no) table naming the lists each query scans.
    * Identical pruned-join shape to [[search]] — the probed-list union
    * statically prunes the invlists read, the probe table broadcasts,
    * one partial-top-k exchange. `broadcastProbes = false` is the
    * big-batch form ([[search]]'s broadcastQueries contract): probesDf
    * may be corpus-sized, so no driver enumeration of the probed set
    * and a shuffle equi-join instead of a broadcast. */
  def searchPreassigned(queries: DataFrame, probesDf: DataFrame, k: Int,
      queryId: String = "qid", queryVec: String = "qvec",
      filter: Option[Column] = None,
      broadcastProbes: Boolean = true): DataFrame =
    preassignedCandidates(queries, probesDf, queryId, queryVec, filter,
      broadcastProbes)
      .groupBy(col(queryId))
      .agg(topk(col("_dist"), col("id"), k, Metric.ascending(metric)).as("_tk"))
      .select(col(queryId), posexplode(col("_tk")).as(Seq("_pos", "_r")))
      .select(col(queryId), (col("_pos") + 1).cast("long").as("rank"),
        col("_r.id").as("id"), col("_r.dist").as("dist"))

  /** Shared scan head of the preassigned entry points: statically
    * prune the invlists to the probed set (derived from probesDf
    * ALONE — enumerating it must not execute the queries side), then
    * the broadcast equi-join + distance. With `broadcastProbes=false`
    * (corpus-sized probesDf) nothing crosses the driver: the shuffle
    * equi-join on list_no is the prune. */
  private def preassignedCandidates(queries: DataFrame, probesDf: DataFrame,
      queryId: String, queryVec: String, filter: Option[Column],
      broadcastProbes: Boolean = true): DataFrame = {
    val pr = queries.select(col(queryId), col(queryVec))
      .join(probesDf.select(col(queryId), col("list_no")), queryId)
    val lists0 =
      if (!broadcastProbes) invlists
      else {
        val probed = probesDf.select(col("list_no").cast("int"))
          .distinct().collect().map(_.getInt(0))
        invlists.filter(col("list_no").isin(probed.map(Integer.valueOf): _*))
      }
    val lists = filter.map(lists0.filter).getOrElse(lists0)
    lists.join(if (broadcastProbes) broadcast(pr) else pr, "list_no")
      .select(col(queryId), col("id"),
        vec_dist(col(queryVec), col("vec"), metric).as("_dist"))
  }

  /** Operating-point sweep (faiss ParameterSpace::explore,
    * AutoTune.cpp:446-521): the per-query top-k at EVERY requested
    * nprobe, from ONE scan at max(nprobes). Each candidate carries the
    * probe rank `pr` of its list for that query, so the nprobe=j
    * candidate set is exactly `pr < j` — searching the sweep points
    * one by one would rescan the same lists |nprobes| times for
    * identical results (the reference re-runs the index per operating
    * point because its scan is in-memory; at 100 TB each rescan is a
    * full pruned read, so deriving all points from one read is the
    * dataflow-correct shape). Output (np, qid, rank, id, dist),
    * bit-identical per np to `search(queries, k, np)`. */
  def searchSweep(queries: DataFrame, k: Int, nprobes: Seq[Int],
      queryId: String = "qid", queryVec: String = "qvec",
      broadcastQueries: Boolean = true): DataFrame = {
    val sess = queries.sparkSession
    val npMax = nprobes.max
    val pr = probes(queries, npMax, queryId, queryVec)
    // same contract as [[search]]: a corpus-sized query set must not
    // drive an eager probed-set collect — the equi-join is the prune
    val lists =
      if (!broadcastQueries) invlists
      else {
        val probed = pr.select("list_no").distinct().collect().map(_.getInt(0))
        invlists.filter(col("list_no").isin(probed.map(Integer.valueOf): _*))
      }
    val prSide = if (broadcastQueries) broadcast(pr) else pr
    val cand = lists.join(prSide, "list_no")
      .select(col(queryId), col("pr"), col("id"),
        vec_dist(col(queryVec), col("vec"), metric).as("_dist"))
    import sess.implicits._
    // tiny nprobe axis: broadcast theta-join fans each candidate out to
    // only the sweep points whose probe budget includes its list
    val nps = broadcast(nprobes.toDF("np"))
    cand.join(nps, col("pr") < col("np"))
      .groupBy(col("np"), col(queryId))
      .agg(topk(col("_dist"), col("id"), k, Metric.ascending(metric)).as("_tk"))
      .select(col("np"), col(queryId), posexplode(col("_tk")).as(Seq("_pos", "_r")))
      .select(col("np"), col(queryId), (col("_pos") + 1).cast("long").as("rank"),
        col("_r.id").as("id"), col("_r.dist").as("dist"))
  }

  /** IVF range search (faiss/IndexIVF.cpp:690-795): same pruning,
    * radius predicate instead of top-k. `filter` is the IDSelector
    * pushed inside the scan and `maxCodes` the per-query TOTAL scan
    * budget in probe-rank order ([[budgetProbes]]) —
    * range_search_with_parameters (faiss/IVFlib.h:46) takes the
    * identical knobs search_with_parameters does. */
  def rangeSearch(queries: DataFrame, radius: Double, nprobe: Int,
      queryId: String = "qid", queryVec: String = "qvec",
      filter: Option[Column] = None,
      maxCodes: Option[Int] = None,
      coarse: Option[Probes.CoarseQuant] = None,
      broadcastQueries: Boolean = true): DataFrame = {
    val pr0 = probes(queries, nprobe, queryId, queryVec, coarse)
    // static prune only for small query sets; see [[search]]
    def pruneLists(pr: DataFrame): DataFrame =
      if (!broadcastQueries) invlists
      else {
        val probed = pr.select("list_no").distinct().collect().map(_.getInt(0))
        invlists.filter(col("list_no").isin(probed.map(Integer.valueOf): _*))
      }
    // budget sizes are pre-IDSelector (the reference counts raw
    // list_size even under a selector)
    val listsRaw = pruneLists(pr0)
    val pr = maxCodes.map(budgetProbes(pr0, listsRaw, _, queryId)).getOrElse(pr0)
    val lists0 = if (maxCodes.isDefined) pruneLists(pr) else listsRaw
    val lists = filter.map(lists0.filter).getOrElse(lists0)
    val asc = Metric.ascending(metric)
    val pred = if (asc) col("dist") < radius else col("dist") > radius
    val prSide = if (broadcastQueries) broadcast(pr) else pr
    lists.join(prSide, "list_no")
      .select(col(queryId), col("list_no"), col("id"),
        vec_dist(col(queryVec), col("vec"), metric).as("dist"))
      .select(col(queryId), col("id"), col("dist")).filter(pred)
  }

  /** Which list each base id landed in (search_centroid,
    * faiss/IVFlib.h:62) — list_no is just a column here. */
  def listAssignments: DataFrame = invlists.select(col("id"), col("list_no"))

  /** range_search_preassigned (contrib/ivf_tools.py:57): radius
    * search over CALLER-PROVIDED (queryId, list_no) probe
    * assignments — the quantizer never runs; the in-radius filter
    * applies below any aggregation. Output (qid, id, dist). */
  def rangeSearchPreassigned(queries: DataFrame, probesDf: DataFrame,
      radius: Double, queryId: String = "qid",
      queryVec: String = "qvec",
      broadcastProbes: Boolean = true): DataFrame =
    preassignedCandidates(queries, probesDf, queryId, queryVec, None,
      broadcastProbes)
      .filter(if (Metric.ascending(metric)) col("_dist") < radius
        else col("_dist") > radius)
      .select(col(queryId), col("id"), col("_dist").as("dist"))

  /** add_preassigned (contrib/ivf_tools.py:9): append vectors whose
    * list assignment was computed externally — no quantizer run. The
    * assignment IS a `list_no` column here, so this is a bare union;
    * exposed as the explicit API the reference's big-batch ingest
    * tooling expects. Immutable rewrite like [[mergeFrom]]. */
  def addPreassigned(df: DataFrame, idCol: String = "id",
      vecCol: String = "vec", listCol: String = "list_no"): IvfIndex =
    new IvfIndex(d, metric, nlist, centroids,
      invlists.unionByName(df.select(col(idCol).as("id"),
        col(vecCol).as("vec"),
        // fail fast on an out-of-range assignment (add_core's list-id
        // assert): a vector stored in a list no probe set can reach
        // would be silent recall loss. Plan-embedded assertion — no
        // extra validation job, one comparison per ingested row.
        when(col(listCol) >= 0 && col(listCol) < nlist,
          col(listCol).cast("int"))
          .otherwise(raise_error(concat(
            lit(s"add_preassigned: list_no out of [0, $nlist): "),
            col(listCol).cast("string"))))
          .as("list_no"))))

  /** merge_from (faiss/Index.h:273-282): same centroids required
    * (check_compatible_for_merge analog = same nlist/d/metric); ids
    * optionally shifted. */
  def mergeFrom(other: IvfIndex, addId: Long = 0L): IvfIndex = {
    require(other.d == d && other.metric == metric && other.nlist == nlist,
      "incompatible indexes (d/metric/nlist differ)")
    new IvfIndex(d, metric, nlist, centroids,
      invlists.unionByName(
        other.invlists.withColumn("id", col("id") + addId)))
  }

  /** remove_ids (faiss/Index.h:164-167) as an immutable rewrite. */
  def removeIds(ids: DataFrame): IvfIndex =
    new IvfIndex(d, metric, nlist, centroids,
      invlists.join(broadcast(ids), Seq("id"), "left_anti"))

  def save(path: String): Unit = IvfIndex.save(this, path)
}

object IvfIndex {

  /** Train + add (IndexIVF lifecycle steps 2-3, SURVEY §3.1).
    * `centroids0` replaces the internal k-means with a caller-supplied
    * trained quantizer — the distributed_ondisk shard-build step
    * (benchs/distributed_ondisk: every slice populates its own
    * invlists against ONE shared centroid table, so the later merge
    * is a write, never a recluster). Assignment runs through the same
    * NearestCentroid expression `KMeans.Model.assign` uses, so a
    * shard build and a single build place every vector identically. */
  def build(df: DataFrame, idCol: String, vecCol: String, nlist: Int,
      metric: String = "l2sq", niter: Int = 10, seed: Long = 1234L,
      centroids0: Array[Array[Float]] = null): IvfIndex = {
    val data = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val centroids =
      if (centroids0 != null) {
        require(centroids0.length == nlist,
          s"centroids0 has ${centroids0.length} rows, nlist = $nlist")
        centroids0
      } else KMeans.fit(data, "vec",
        KMeans.Params(k = nlist, niter = niter, seed = seed)).centroids
    val d = centroids.head.length
    val assigned = data
      .withColumn("_a", shim.col(graft.core.NearestCentroid(
        shim.expr(col("vec")), centroids, "l2sq")))
      .select(col("id"), col("vec"), col("_a.list_no").as("list_no"))
    new IvfIndex(d, metric, nlist, centroids, assigned)
  }

  /** merge_ondisk (contrib/ondisk.py:13): union many indexes that
    * share ONE trained quantizer into a single list_no-partitioned
    * on-disk store and return the merged index backed by it — the
    * shard-build-then-merge lifecycle of corpus-scale ingestion (each
    * worker populates its own invlists against the common centroids;
    * the merge is a write, never a recluster). The store is a FULL
    * save (invlists + meta sidecar), so a later session reopens it
    * with [[load]]; the returned index reads from disk, so searches
    * partition-prune the merged store exactly like any loaded one. */
  def mergeOnDisk(indexes: Seq[IvfIndex], path: String): IvfIndex = {
    require(indexes.nonEmpty, "no indexes to merge")
    val h = indexes.head
    indexes.tail.foreach { i =>
      require(i.d == h.d && i.metric == h.metric && i.nlist == h.nlist,
        "merge_ondisk requires a common trained quantizer")
      require(java.util.Arrays.deepEquals(
          i.centroids.asInstanceOf[Array[AnyRef]],
          h.centroids.asInstanceOf[Array[AnyRef]]),
        "merge_ondisk requires IDENTICAL centroids (one shared quantizer)")
    }
    val spark = h.invlists.sparkSession
    save(new IvfIndex(h.d, h.metric, h.nlist, h.centroids,
      indexes.map(_.invlists).reduce(_ unionByName _)), path)
    load(spark, path)
  }

  /** Persist as list_no-partitioned parquet + a one-row-per-centroid
    * JSON sidecar (read_index/write_index analog,
    * faiss/impl/index_write.cpp — format is parquet+JSON, not the
    * fourcc binary). */
  def save(idx: IvfIndex, path: String): Unit = {
    val spark = idx.invlists.sparkSession
    idx.invlists
      .repartition(col("list_no"))
      .write.mode("overwrite").partitionBy("list_no")
      .parquet(s"$path/invlists")
    import spark.implicits._
    idx.centroids.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq, idx.d, idx.metric, idx.nlist) }
      .toDF("list_no", "centroid", "d", "metric", "nlist")
      .writeSidecar(s"$path/meta")
    graft.io.IndexIO.saveKind(spark, path, "ivfflat")
  }

  def load(spark: SparkSession, path: String): IvfIndex = {
    val meta = JsonSidecar.read(spark, s"$path/meta")
      .select(col("list_no").cast("int"),
        col("centroid").cast("array<float>"),
        col("d").cast("int"), col("metric"), col("nlist").cast("int"))
      .collect()
    val d = meta.head.getInt(2)
    val metric = meta.head.getString(3)
    val nlist = meta.head.getInt(4)
    val centroids = new Array[Array[Float]](nlist)
    meta.foreach { r => centroids(r.getInt(0)) = r.getSeq[Float](1).toArray }
    val invlists = spark.read.parquet(s"$path/invlists")
      .select(col("id"), col("vec"), col("list_no").cast("int"))
    new IvfIndex(d, metric, nlist, centroids, invlists)
  }
}
