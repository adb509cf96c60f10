package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ProductResidualQuantizer / ProductLocalSearchQuantizer
  * (faiss/impl/ProductAdditiveQuantizer.h:28,114; built by the
  * index-factory PRQ / PLSQ codes): the vector is split into `nsplit`
  * contiguous sub-vectors, each encoded by an INDEPENDENT residual
  * quantizer — PQ's subspace decomposition applied to additive codes.
  * The stored code is the concatenation of the per-split level codes.
  *
  * Spark shape: pure expression composition — `slice` the vector per
  * split, run the existing RQEncode/RQDecode kernels (with beam / ICM
  * options), `concat` the pieces. No new shuffle, no new Catalyst
  * expression; training is nsplit independent Rq.train runs over
  * sliced projections of the same scan.
  */
case class PrqModel(nsplit: Int, dsub: Int, sub: Array[RqModel]) {
  def levels: Int = sub(0).levels

  /** array<int> of nsplit*levels codes: [s0_l0 .. s0_lL, s1_l0 ..]. */
  def encodeCol(vecCol: Column, beam: Int = 1, icmIters: Int = 0): Column =
    concat(sub.zipWithIndex.map { case (m, s) =>
      m.encodeCol(slice(vecCol, s * dsub + 1, dsub), beam, icmIters)
    }: _*)

  def decodeCol(codesCol: Column): Column =
    concat(sub.zipWithIndex.map { case (m, s) =>
      m.decodeCol(slice(codesCol, s * m.levels + 1, m.levels))
    }: _*)

  def roundtripCol(vecCol: Column, beam: Int = 1, icmIters: Int = 0): Column =
    decodeCol(encodeCol(vecCol, beam, icmIters))

  /** (m, j, c) codebook rows with m = split*levels + level — the same
    * flat layout the reference serializes (ProductAdditiveQuantizer
    * owns one AdditiveQuantizer per split). */
  def flatCodebooks: Array[Array[Array[Float]]] =
    sub.flatMap(_.codebooks)
}

object Prq {

  /** nsplit independent RQ trainings over the vector slices (the
    * reference trains each sub-quantizer on its sub-vectors,
    * ProductAdditiveQuantizer::train). */
  def train(df: DataFrame, vecCol: String, nsplit: Int = 2,
      levels: Int = 2, k: Int = 16, niter: Int = 6,
      seed: Long = 1234L, beam: Int = 1): PrqModel = {
    val d = df.select(size(col(vecCol))).first().getInt(0)
    require(d % nsplit == 0, s"d=$d not divisible by nsplit=$nsplit")
    val dsub = d / nsplit
    val sub = Array.tabulate(nsplit) { s =>
      Rq.train(df.select(slice(col(vecCol), s * dsub + 1, dsub).as("_sv")),
        "_sv", levels, k, niter, seed + 100L * s, beam)
    }
    PrqModel(nsplit, dsub, sub)
  }
}
