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

  /** Per-query count table of range_PR (contrib/evaluation.py:76
    * counts_to_PR inputs): ngt = ground-truth results, nres = found
    * results, ninter = correct results. `queries` enumerates ALL
    * query ids — queries with zero results on either side still count
    * (they drive the empty-set conventions below). Three grouped
    * counts + left joins on the query key: scale-safe. */
  def rangePRCounts(truth: DataFrame, approx: DataFrame, queries: DataFrame,
      queryId: String = "qid", id: String = "id"): DataFrame = {
    val t = truth.select(col(queryId), col(id))
    val a = approx.select(col(queryId), col(id))
    val ngt = t.groupBy(col(queryId)).agg(count(lit(1)).as("ngt"))
    val nres = a.groupBy(col(queryId)).agg(count(lit(1)).as("nres"))
    val ninter = t.join(a, Seq(queryId, id), "inner")
      .groupBy(col(queryId)).agg(count(lit(1)).as("ninter"))
    queries.select(col(queryId)).distinct()
      .join(ngt, Seq(queryId), "left")
      .join(nres, Seq(queryId), "left")
      .join(ninter, Seq(queryId), "left")
      .select(col(queryId),
        coalesce(col("ngt"), lit(0L)).as("ngt"),
        coalesce(col("nres"), lit(0L)).as("nres"),
        coalesce(col("ninter"), lit(0L)).as("ninter"))
  }

  /** range_PR (contrib/evaluation.py:38-130): precision/recall of a
    * range-search result vs the reference radius scan, distances
    * ignored. One row (precision, recall). `mode = "overall"` sums
    * counts over all queries first — precision = 1 when nothing was
    * returned, recall = 1 when there is no GT and nothing returned,
    * 0 when there is no GT but spurious results. `mode = "average"`
    * applies the same conventions per query (a no-GT query's recall
    * is 1 iff it returned nothing; a no-result query's precision is
    * 1) and averages. */
  def rangePR(counts: DataFrame, mode: String = "overall"): DataFrame = mode match {
    case "overall" =>
      counts.agg(sum(col("ngt")).as("_g"), sum(col("nres")).as("_r"),
          sum(col("ninter")).as("_i"))
        .select(
          when(col("_r") > 0, col("_i").cast("double") / col("_r"))
            .otherwise(lit(1.0)).as("precision"),
          when(col("_g") > 0, col("_i").cast("double") / col("_g"))
            .when(col("_r") === 0, lit(1.0))
            .otherwise(lit(0.0)).as("recall"))
    case "average" =>
      counts.select(
          when(col("nres") > 0, col("ninter").cast("double") / col("nres"))
            .otherwise(lit(1.0)).as("_p"),
          when(col("ngt") > 0, col("ninter").cast("double") / col("ngt"))
            .when(col("nres") === 0, lit(1.0))
            .otherwise(lit(0.0)).as("_r"))
        .agg(avg(col("_p")).as("precision"), avg(col("_r")).as("recall"))
    case other => throw new IllegalArgumentException(s"unknown range_PR mode $other")
  }
}
