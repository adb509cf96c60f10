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
