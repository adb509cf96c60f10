package graft.index

import org.apache.spark.sql.DataFrame

/** Driver-side handling of IVF probe plans (the (qid, …, list_no)
  * coarse-assignment output of a search's query side). */
object Probes {

  /** The distinct probed list ids, collected for static partition
    * pruning of the invlists scan.
    *
    * Only `list_no` INTS ever cross the driver (≤ nlist of them after
    * distinct): the probe plan itself — which may carry per-query LUT
    * columns of M×16 doubles — stays cluster-side, and the caller
    * ships it to the scan with broadcast(probesPlan). Collecting the
    * full LUT-bearing probe rows instead (the r8 idiom) is the first
    * driver OOM when the query table grows 100x (VERDICT r8). The
    * probe subplan executes twice (this distinct + the broadcast
    * exchange), but it is nq·nprobe rows of per-query arithmetic —
    * pennies next to a driver that must hold every LUT at once.
    */
  def probedListIds(probesPlan: DataFrame): Array[Int] =
    probesPlan.select("list_no").distinct().collect().map(_.getInt(0))

  /** A graph-accelerated coarse quantizer for probe selection — the
    * reference's `IVF<n>_HNSW<m>` / `IVF<n>_NSG<R>` coarse grammar
    * (index_factory.cpp:253-262), where the per-query centroid argmin
    * is replaced by a walk over a per-executor graph of the centroids
    * (the scale path at nlist large enough that the exact O(nlist)
    * argmin dominates). `budget` is the walk's candidate-pool size
    * (HNSW efSearch / NSG searchL); budget >= nlist degenerates to
    * the exact probe set — the oracle-gate convention. */
  sealed trait CoarseQuant
  sealed trait GraphCoarse extends CoarseQuant { def budget: Int }
  /** HNSW walk, degree `m` (IndexHNSWFlat as quantizer). */
  final case class HnswCoarse(efSearch: Int, m: Int = 32) extends GraphCoarse {
    def budget: Int = efSearch
  }
  /** NSG walk, out-degree `r` (IndexNSGFlat as quantizer). */
  final case class NsgCoarse(searchL: Int, r: Int = 32) extends GraphCoarse {
    def budget: Int = searchL
  }
  /** IndexPQ as quantizer (`IVF<n>(PQ<m>[x<k>])` paren coarse,
    * index_factory.cpp:263-267): cells ranked by ADC over a
    * driver-trained PQ of the centroid table
    * ([[graft.core.CoarsePq]]) — approximate by quantization, not by
    * a walk budget, so there is no exact-degenerate knob; the oracle
    * replays the encode/LUT/ADC arithmetic instead. */
  final case class PqAdcCoarse(m: Int, ksub: Int = 16, niter: Int = 10,
      seed: Long = 1234L) extends CoarseQuant
  /** IVF-Flat as quantizer (`IVF<n>(IVF<n2>,Flat)` paren coarse):
    * rank the nlist2 sub-centroids, scan only the centroids of the
    * best nprobe2 sub-cells ([[graft.core.NearestCentroidsIvf2]]).
    * nprobe2 >= nlist2 degenerates to the exact ranking; the
    * sub-clustering is a driver-trained 1-subspace k-means over the
    * centroid table ([[graft.core.CoarsePq]] with m = 1). */
  final case class IvfFlatCoarse(nlist2: Int, nprobe2: Int, niter: Int = 10,
      seed: Long = 1234L) extends CoarseQuant

  /** Coarse probe-selection expression shared by every IVF-family
    * code index: the exact O(nlist) argmin ranking
    * ([[graft.core.NearestCentroids]]) or, under a [[GraphCoarse]],
    * the per-executor graph walk over the centroids
    * ([[graft.core.NearestCentroidsHnsw]] /
    * [[graft.core.NearestCentroidsNsg]]; budget >= nlist degenerates
    * to exact). Returns an array<struct(list_no, dist)> column ranked
    * best-first. The graph degree is folded into the cache key so one
    * index searched at two degrees never reuses the other's graph. */
  def selExpr(queryVec: org.apache.spark.sql.Column,
      centroids: Array[Array[Float]], nprobe: Int, metric: String,
      coarse: Option[CoarseQuant],
      cacheKey: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.shim
    val np = math.min(nprobe, centroids.length)
    coarse match {
      case Some(g) =>
        require(metric == "l2sq",
          "non-exact coarse quantizers are L2-only (reference semantics)")
        g match {
          case HnswCoarse(ef, m) =>
            shim.col(graft.core.NearestCentroidsHnsw(shim.expr(queryVec),
              centroids, np, ef, m = m, cacheKey = s"$cacheKey:hnsw:m=$m"))
          case NsgCoarse(sl, r) =>
            shim.col(graft.core.NearestCentroidsNsg(shim.expr(queryVec),
              centroids, np, sl, r = r, cacheKey = s"$cacheKey:nsg:r=$r"))
          case PqAdcCoarse(m, ksub, ni, sd) =>
            val (cb, codes) = graft.core.CoarsePq.model(centroids, m, ksub, ni, sd)
            shim.col(graft.core.NearestCentroidsAdc(shim.expr(queryVec),
              cb, codes, np))
          case IvfFlatCoarse(n2, np2, ni, sd) =>
            // integer-assignment sub-clustering: nlist2 is NOT capped
            // at 256 (no byte code anywhere in this path)
            val (subCents, assign) = graft.core.CoarsePq.assignModel(
              centroids, n2, ni, sd)
            shim.col(graft.core.NearestCentroidsIvf2(shim.expr(queryVec),
              subCents, assign, centroids,
              math.min(np2, subCents.length), np))
        }
      case None =>
        shim.col(graft.core.NearestCentroids(shim.expr(queryVec),
          centroids, np, metric))
    }
  }

  /** The (list_no, centroid: array<float>) table every IVF-family
    * search embeds as a broadcast — one definition instead of a
    * per-method literal (r10 review). */
  def centroidsDf(spark: org.apache.spark.sql.SparkSession,
      centroids: Array[Array[Float]]): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    centroids.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }.toDF("list_no", "centroid")
      .select(col("list_no"),
        col("centroid").cast("array<float>").as("centroid"))
  }
}
