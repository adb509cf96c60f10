package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim
import graft.core.{RQDecode, RQEncode, RQIpFromLut, RQLut}
import graft.functions.vec_sub

/** Residual (additive) quantizer — faiss/IndexAdditiveQuantizer.h:25 /
  * impl/ResidualQuantizer.cpp: L full-dimension k-means codebooks, each
  * trained on the residual distribution left by the previous levels
  * (ResidualQuantizer::train's level loop), with beam-search encoding
  * (refine_beam, ResidualQuantizer.cpp:651; beam width = max_beam_size,
  * ResidualQuantizer.h:55). beam = 1 is the greedy path.
  *
  * Scale shape: training is L sequential KMeans.fit calls (each fully
  * distributed, k·d floats to the driver per round) with the level-l
  * residual computed by a single codegen'd encode+decode expression
  * over the original vectors — no join, no shuffle; encode/decode are
  * plan expressions and the L·log2(k) bits/vector code column shuffles
  * like any other column. Beam width multiplies per-row encode CPU
  * (L·beam·k·d flops), never the dataflow.
  */
case class RqModel(levels: Int, k: Int, codebooks: Array[Array[Array[Float]]]) {
  /** `icmIters` > 0 refines the beam codes with LSQ-style iterated
    * conditional modes (LocalSearchQuantizer::icm_encode,
    * impl/LocalSearchQuantizer.cpp:505). */
  def encodeCol(vecCol: Column, beam: Int = 1, icmIters: Int = 0): Column =
    shim.col(RQEncode(shim.expr(vecCol), codebooks, beam, icmIters))
  def decodeCol(codesCol: Column): Column =
    shim.col(RQDecode(shim.expr(codesCol), codebooks))
  /** decode(encode(x)) in one expression. */
  def roundtripCol(vecCol: Column, beam: Int = 1, icmIters: Int = 0): Column =
    decodeCol(encodeCol(vecCol, beam, icmIters))
  /** Per-query LUT (compute_LUT): flat [levels·k] doubles. */
  def lutCol(qvecCol: Column): Column =
    shim.col(RQLut(shim.expr(qvecCol), codebooks))
  /** <q, decode(codes)> via the LUT — the ST_LUT_* scan arithmetic. */
  def ipFromLutCol(codesCol: Column, lutCol: Column): Column =
    shim.col(RQIpFromLut(shim.expr(codesCol), shim.expr(lutCol), k))
}

object Rq {

  /** Level-by-level training: level l is a k-means fit on the
    * residuals after subtracting the levels-0..l-1 reconstruction,
    * where the partial encoding uses `beam`-wide beam search and the
    * residual of the BEST beam entry trains the next level — the
    * reference's Train_top_beam variant
    * (faiss/impl/ResidualQuantizer.h:46-48); beam = 1 reproduces the
    * plain greedy trainer. */
  def train(df: DataFrame, vecCol: String, levels: Int = 2, k: Int = 16,
      niter: Int = 6, seed: Long = 1234L, beam: Int = 1): RqModel = {
    val vecs = df.select(col(vecCol).as("_v")).filter(col("_v").isNotNull)
    val cbs = new Array[Array[Array[Float]]](levels)
    for (l <- 0 until levels) {
      val res =
        if (l == 0) vecs.select(col("_v").as("_res"))
        else {
          val partial = RqModel(l, k, cbs.take(l))
          vecs.select(
            vec_sub(col("_v"), partial.roundtripCol(col("_v"), beam)).as("_res"))
        }
      cbs(l) = graft.cluster.KMeans.fit(res, "_res",
        graft.cluster.KMeans.Params(k = k, niter = niter, seed = seed + l))
        .centroids
    }
    RqModel(levels, k, cbs)
  }
}
