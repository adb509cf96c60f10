package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim
import graft.core._
import graft.functions.topk

/** Flat scalar-quantized index (IndexScalarQuantizer,
  * faiss/IndexScalarQuantizer.h:25, QT_8bit / RS_minmax): vectors
  * stored as 1-byte-per-dim codes, searched with asymmetric
  * decode-on-the-fly distances ([[graft.core.SqKernels.adcL2sq]]).
  * 4× smaller scan footprint than float32 — at 100 TB that is the
  * difference between scanning 25 TB and 100 TB per exhaustive query.
  */
class SqIndex(
    val vmin: Array[Double],
    val vdiff: Array[Double],
    /** (id: long, code: binary) */
    val codes: DataFrame) {

  def d: Int = vmin.length

  /** Asymmetric kNN (query floats vs stored codes). */
  def search(queries: DataFrame, k: Int,
      queryId: String = "qid", queryVec: String = "qvec"): DataFrame = {
    val dist = shim.col(SQAdcL2(
      shim.expr(col(queryVec)), shim.expr(col("code")), vmin, vdiff))
    codes.crossJoin(broadcast(queries))
      .select(col(queryId), col("id"), dist.as("_dist"))
      .groupBy(col(queryId))
      .agg(topk(col("_dist"), col("id"), k, asc = true).as("_tk"))
      .select(col(queryId), posexplode(col("_tk")).as(Seq("_pos", "_r")))
      .select(col(queryId), (col("_pos") + 1).cast("long").as("rank"),
        col("_r.id").as("id"), col("_r.dist").as("dist"))
  }

  /** Lossy reconstruct (sa_decode): (id, vec array<double>). */
  def reconstruct: DataFrame =
    codes.select(col("id"),
      shim.col(SQDecode(shim.expr(col("code")), vmin, vdiff)).as("vec"))
}

object SqIndex {

  /** Train (per-dim min/max over the data, RS_minmax) + encode. */
  def build(df: DataFrame, idCol: String, vecCol: String): SqIndex = {
    val mm = df.agg(shim.agg(VecMinMaxAgg(shim.expr(col(vecCol)))).as("_mm"))
      .select(col("_mm.mins"), col("_mm.maxs")).collect().head
    val mins = mm.getSeq[Double](0).toArray
    val maxs = mm.getSeq[Double](1).toArray
    val vdiff = mins.indices.map(i => maxs(i) - mins(i)).toArray
    val codes = df.select(col(idCol).as("id"),
      shim.col(SQEncode(shim.expr(col(vecCol)), mins, vdiff)).as("code"))
    new SqIndex(mins, vdiff, codes)
  }
}
