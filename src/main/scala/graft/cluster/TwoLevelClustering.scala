package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim
import graft.core.{NearestCentroid, PQSubAssign, VecSumAgg}

/** Two-level clustering for large nlist (contrib/clustering.py:24-119
  * two_level_clustering / train_ivf_index_with_2level): cluster to
  * √nlist coarse groups, then refine each group independently. The
  * refinement runs ALL groups per Lloyd round in one distributed job —
  * assignment by [[graft.core.PQSubAssign]] with per-group codebooks
  * (group id plays the subspace role), update by a single
  * groupBy(group, j) + VecSumAgg — so nlist=10⁵ costs the same number
  * of Spark jobs as nlist=10. */
object TwoLevelClustering {

  /** Returns nlist centroids (concatenated group codebooks). */
  def fit(df: DataFrame, vecCol: String, nlist: Int,
      niter1: Int = 5, niter2: Int = 5, seed: Long = 1234L): Array[Array[Float]] = {
    val k1 = math.max(1, math.ceil(math.sqrt(nlist.toDouble)).toInt)
    val level1 = KMeans.fit(df, vecCol, KMeans.Params(k = k1, niter = niter1, seed = seed))

    // per-group sub-cluster counts (distribute nlist over groups)
    val k2 = Array.tabulate(k1)(g => nlist / k1 + (if (g < nlist % k1) 1 else 0))

    val assigned = df.select(col(vecCol).as("vec"),
      shim.col(NearestCentroid(shim.expr(col(vecCol)), level1.centroids)).as("_a"))
      .select(col("vec"), col("_a.list_no").as("_g"))
      .cache()
    try {
      // init: per-group first k2(g) rows in hash order (one job)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("_g")).orderBy(xxhash64(col("vec"), lit(seed)))
      val initRows = assigned.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= lit(k2.max))
        .select(col("_g"), col("_rn"), col("vec")).collect()
      var codebooks: Array[Array[Array[Float]]] = Array.tabulate(k1) { g =>
        val rows = initRows.filter(_.getInt(0) == g).sortBy(_.getInt(1))
          .take(k2(g)).map(_.getSeq[Float](2).toArray)
        if (rows.isEmpty) Array(level1.centroids(g)) else rows
      }

      for (_ <- 0 until niter2) {
        val stats = assigned.select(col("_g"),
          shim.col(PQSubAssign(shim.expr(col("_g")), shim.expr(col("vec")),
            codebooks)).as("_j"), col("vec"))
          .groupBy(col("_g"), col("_j"))
          .agg(shim.agg(VecSumAgg(shim.expr(col("vec")))).as("s"))
          .collect()
        val next = codebooks.map(_.map(_.clone()))
        stats.foreach { r =>
          val g = r.getInt(0); val j = r.getInt(1)
          val s = r.getStruct(2)
          val sums = s.getSeq[Double](0); val cnt = s.getLong(1)
          if (cnt > 0) next(g)(j) = sums.map(x => (x / cnt).toFloat).toArray
        }
        codebooks = next
      }
      codebooks.flatten
    } finally assigned.unpersist()
  }
}
