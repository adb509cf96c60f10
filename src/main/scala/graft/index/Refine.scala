package graft.index

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.knn.Knn

/** Two-stage re-rank (IndexRefine / IndexRefineFlat,
  * faiss/IndexRefine.h:17-80): stage 1 produces k * k_factor
  * candidates from a cheap index; stage 2 re-scores them with exact
  * vectors and keeps the top k. The candidate set is tiny (queries ×
  * k·k_factor rows), so stage 2 is an equi-join on id — never a second
  * scan of the base table. */
/** Persistable IndexRefine state for the SQ-family coarse stage (the
  * `SQ8,RFlat` / `Refine(SQ…)` composites — write_index(IndexRefine),
  * faiss/impl/index_write.cpp serializes base_index + refine_index +
  * k_factor; here the refine storage is the exact base table and the
  * coarse stage an [[SqIndex]], each with its own save/load. Wider
  * refine chains re-compose from their parts' own IO.) */
class RefineFlatIndex(val inner: SqIndex, val base: DataFrame,
    val kFactor: Int = 4, val metric: String = "l2sq") {
  def search(queries: DataFrame, k: Int,
      queryId: String = "qid", queryVec: String = "qvec"): DataFrame = {
    val stage1 = inner.search(queries, k * kFactor, queryId, queryVec)
    Refine.rerank(queries, base, stage1, k, metric, queryId, queryVec)
  }
}

object RefineFlatIndex {
  def build(base: DataFrame, idCol: String, vecCol: String,
      kFactor: Int = 4, qtype: String = "SQ8",
      metric: String = "l2sq"): RefineFlatIndex =
    new RefineFlatIndex(SqIndex.build(base, idCol, vecCol, qtype = qtype),
      base.select(col(idCol).as("id"), col(vecCol).as("vec")),
      kFactor, metric)
}

object Refine {

  /** Re-rank `candidates` (qid, id) with exact distances against
    * `base` (id, vec) for `queries` (qid, qvec). */
  def rerank(queries: DataFrame, base: DataFrame, candidates: DataFrame,
      k: Int, metric: String = "l2sq",
      queryId: String = "qid", queryVec: String = "qvec",
      baseId: String = "id", baseVec: String = "vec"): DataFrame =
    Knn.knnByIdx(queries, base, candidates.select(col(queryId), col(baseId)),
      k, metric, 0.0, queryId, queryVec, baseId, baseVec)

  /** SQ8 coarse stage + exact re-rank (the "SQ8,RFlat" factory
    * composite). */
  def sqRefineSearch(queries: DataFrame, base: DataFrame, k: Int,
      kFactor: Int = 4, metric: String = "l2sq"): DataFrame = {
    val sq = SqIndex.build(base, "id", "vec")
    val stage1 = sq.search(queries, k * kFactor)
    rerank(queries, base, stage1, k, metric)
  }

  /** IVFPQ + exact re-rank with k_factor (IndexIVFPQR,
    * faiss/IndexIVFPQR.h:19, default k_factor = 4; our stage 2
    * re-scores with exact vectors rather than a second residual PQ —
    * same plan shape, strictly better precision). */
  def ivfPqRefineSearch(queries: DataFrame, base: DataFrame, idx: IvfPqIndex,
      k: Int, nprobe: Int, kFactor: Int = 4): DataFrame = {
    val stage1 = idx.search(queries, k * kFactor, nprobe)
    rerank(queries, base, stage1, k)
  }
}
