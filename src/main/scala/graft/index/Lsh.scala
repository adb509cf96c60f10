package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.transform.Linear

/** IndexLSH (faiss/IndexLSH.h:23; factory `LSH[r][t]` /
  * `LSH<nbits>`): sign bits of the (optionally rotated) components,
  * optionally centered on trained per-component medians
  * (IndexLSH.cpp:58-97 train_thresholds), ranked by Hamming through
  * the flat binary scan. This is the persistable index carrier — the
  * factory's LSH routes wrap it — holding exactly the state
  * write_index(IndexLSH) serializes (index_write.cpp: the rotation
  * RandomRotationMatrix, the trained thresholds, the packed codes).
  *
  * `rot = null` is the reference's rotate_data = false form (sign of
  * the raw components).
  */
class LshIndex(val rot: Linear, val thresholds: Option[Array[Double]],
    /** (id, code binary) — the packed sign-bit codes. */
    val codes: DataFrame) {

  /** Query-side encoder: the same rotate → center → sign chain the
    * codes were built with. */
  def encodeCol(c: Column): Column = LshIndex.signBits(rot, thresholds, c)

  /** Hamming kNN of float queries against the stored codes. Output
    * (qid, rank, id, hd). */
  def search(queries: DataFrame, k: Int,
      queryId: String = "qid", queryVec: String = "qvec"): DataFrame =
    BinaryFlat.knnJoin(
      queries.select(col(queryId), encodeCol(col(queryVec)).as("_qc")),
      codes, k, queryId = queryId, queryCode = "_qc")
}

object LshIndex {
  /** sign(((rot?) x) − thresholds?) packed to bits — one projection,
    * codegen-friendly (IndexLSH::apply_preprocess, IndexLSH.cpp:78). */
  def signBits(rot: Linear, thresholds: Option[Array[Double]],
      c: Column): Column = {
    val pre = if (rot != null) rot.applyCol(c) else c
    val centered = thresholds match {
      case Some(th) =>
        zip_with(pre.cast("array<double>"), array(th.map(lit): _*),
          (x, t) => x - t).cast("array<float>")
      case None => pre
    }
    graft.functions.sign_bits(centered)
  }
}
