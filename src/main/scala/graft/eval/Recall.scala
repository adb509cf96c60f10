package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Search-quality evaluation (faiss eval_intersection,
  * python/extra_wrappers.py:114; knn_intersection_measure,
  * contrib/evaluation.py:14): recall@k = |approx ∩ truth| / k per
  * query, as a join + grouped count. */
object Recall {

  /** Per-query intersection size and recall between two (qid, id)
    * result sets; `truth` defines the denominator (its per-qid count). */
  def perQuery(truth: DataFrame, approx: DataFrame,
      queryId: String = "qid", id: String = "id"): DataFrame = {
    val t = truth.select(col(queryId), col(id))
    val a = approx.select(col(queryId), col(id))
    val denom = t.groupBy(col(queryId)).agg(count(lit(1)).as("_n"))
    val inter = t.join(a, Seq(queryId, id), "inner")
      .groupBy(col(queryId)).agg(count(lit(1)).as("_i"))
    denom.join(inter, Seq(queryId), "left")
      .select(col(queryId),
        coalesce(col("_i"), lit(0L)).as("n_intersect"),
        (coalesce(col("_i"), lit(0L)).cast("double") / col("_n").cast("double"))
          .as("recall"))
  }

  /** Mean recall across queries (the single scalar faiss tests
    * threshold on, e.g. test_index_accuracy.py:47). */
  def mean(truth: DataFrame, approx: DataFrame,
      queryId: String = "qid", id: String = "id"): Double =
    perQuery(truth, approx, queryId, id)
      .agg(avg(col("recall"))).collect().head.getDouble(0)
}
