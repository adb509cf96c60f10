package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim
import graft.core.{RQDecode, RQEncode}
import graft.functions.vec_sub

/** Residual (additive) quantizer — the minimal slice of
  * faiss/IndexAdditiveQuantizer.h:25 / impl/ResidualQuantizer.cpp:
  * L greedy levels of full-dimension k-means codebooks, each trained on
  * the residual distribution left by the previous levels
  * (ResidualQuantizer::train's level loop, beam_size=1 semantics).
  *
  * Scale shape: training is L sequential KMeans.fit calls (each fully
  * distributed, k·d floats to the driver per round); encode/decode are
  * plan expressions (no joins, no shuffles); the L·log2(k) bits/vector
  * code column shuffles like any other column.
  */
case class RqModel(levels: Int, k: Int, codebooks: Array[Array[Array[Float]]]) {
  def encodeCol(vecCol: Column): Column =
    shim.col(RQEncode(shim.expr(vecCol), codebooks))
  def decodeCol(codesCol: Column): Column =
    shim.col(RQDecode(shim.expr(codesCol), codebooks))
  /** decode(encode(x)) in one expression. */
  def roundtripCol(vecCol: Column): Column = decodeCol(encodeCol(vecCol))
}

object Rq {

  /** Greedy level-by-level training: level l is a k-means fit on the
    * residuals after subtracting the levels-0..l-1 reconstruction. */
  def train(df: DataFrame, vecCol: String, levels: Int = 2, k: Int = 16,
      niter: Int = 6, seed: Long = 1234L): RqModel = {
    var res = df.select(col(vecCol).as("_res")).filter(col("_res").isNotNull)
    val cbs = new Array[Array[Array[Float]]](levels)
    for (l <- 0 until levels) {
      val m = graft.cluster.KMeans.fit(res, "_res",
        graft.cluster.KMeans.Params(k = k, niter = niter, seed = seed + l))
      cbs(l) = m.centroids
      if (l + 1 < levels) {
        val cents = graft.OracleAux.centroidsDf(df.sparkSession, m.centroids)
          .select(col("list_no"), col("c"))
        res = m.assign(res, "_res")
          .join(broadcast(cents), "list_no")
          .select(vec_sub(col("_res"), col("c")).as("_res"))
      }
    }
    RqModel(levels, k, cbs)
  }
}
