package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact 1-D k-means via dynamic programming over the sorted value
  * histogram (faiss kmeans1d / Clustering1D,
  * faiss/impl/kmeans1d.cpp:303, faiss/Clustering.h:118-125).
  *
  * Scale shape: the distributed part is a groupBy(value) histogram
  * (distinct numeric values, typically tiny vs row count); the DP runs
  * on the driver over the histogram — O(k·m²) for m distinct values
  * (SMAWK is an optimization the reference uses; plain DP gives the
  * same exact optimum).
  */
object KMeans1D {

  case class Result(boundaries: Array[Double], centroids: Array[Double],
      objective: Double)

  def fit(df: DataFrame, valueCol: String, k: Int): Result = {
    val hist = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("c"))
      .orderBy("v").collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    fitHistogram(hist, k)
  }

  /** Exact DP on (value, weight) pairs sorted ascending. */
  def fitHistogram(hist: Array[(Double, Long)], k: Int): Result = {
    val m = hist.length
    require(m > 0, "empty input")
    val kk = math.min(k, m)
    // prefix sums for O(1) weighted SSE of value range [i, j]
    val pw = new Array[Double](m + 1)   // weights
    val ps = new Array[Double](m + 1)   // w*v
    val pss = new Array[Double](m + 1)  // w*v^2
    for (i <- 0 until m) {
      val (v, c) = hist(i)
      pw(i + 1) = pw(i) + c
      ps(i + 1) = ps(i) + c * v
      pss(i + 1) = pss(i) + c * v * v
    }
    def cost(i: Int, j: Int): Double = { // inclusive range [i, j]
      val w = pw(j + 1) - pw(i); val s = ps(j + 1) - ps(i); val ss = pss(j + 1) - pss(i)
      if (w == 0) 0.0 else ss - s * s / w
    }
    // dp(c)(j) = min cost of clustering hist[0..j] into c+1 clusters
    val dp = Array.fill(kk, m)(Double.MaxValue)
    val cut = Array.fill(kk, m)(0)
    for (j <- 0 until m) dp(0)(j) = cost(0, j)
    for (c <- 1 until kk; j <- c until m; i <- c to j) {
      val v = dp(c - 1)(i - 1) + cost(i, j)
      if (v < dp(c)(j)) { dp(c)(j) = v; cut(c)(j) = i }
    }
    // backtrack cluster starts
    val starts = new Array[Int](kk)
    var j = m - 1
    for (c <- (kk - 1) to 0 by -1) {
      starts(c) = if (c == 0) 0 else cut(c)(j)
      j = starts(c) - 1
    }
    val centroids = new Array[Double](kk)
    val bounds = new Array[Double](kk)
    for (c <- 0 until kk) {
      val lo = starts(c)
      val hi = if (c == kk - 1) m - 1 else starts(c + 1) - 1
      val w = pw(hi + 1) - pw(lo); val s = ps(hi + 1) - ps(lo)
      centroids(c) = s / w
      bounds(c) = hist(lo)._1
    }
    Result(bounds, centroids, dp(kk - 1)(m - 1))
  }
}
