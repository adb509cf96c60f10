package graft.tune

import org.apache.spark.sql.DataFrame
import graft.index.IvfIndex
import graft.knn.Knn
import graft.eval.Recall

/** Parameter auto-tuning (faiss ParameterSpace / OperatingPoints,
  * AutoTune.h:87-207): enumerate nprobe operating points, measure
  * recall against the exact oracle and a scan-cost proxy, keep the
  * Pareto frontier (AutoTune.cpp explore). Cost here is the fraction
  * of base rows scanned (deterministic and hardware-independent,
  * unlike wall-clock; the reference's perf counter plays that role).
  */
object AutoTune {

  case class OperatingPoint(nprobe: Int, recall: Double, scannedFrac: Double)

  def explore(idx: IvfIndex, queries: DataFrame, base: DataFrame, k: Int,
      nprobes: Seq[Int]): Seq[OperatingPoint] = {
    import org.apache.spark.sql.functions._
    val truth = Knn.knnJoin(queries, base, k).cache()
    val listSizes = idx.invlists.groupBy("list_no").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = listSizes.values.sum.toDouble
    try {
      // ONE pruned scan at max(nprobes) yields every operating point
      // (IvfIndex.searchSweep); re-searching per point would rescan
      // identical lists |nprobes| times. Recall for ALL points is then
      // one join+agg against the exact truth (Recall.perQuery
      // semantics, grouped by sweep point), and the scan-cost proxy
      // comes from each list's MINIMUM probe rank over the query set
      // (list probed at nprobe=np iff min rank < np).
      val sess = queries.sparkSession
      import sess.implicits._
      val sweep = idx.searchSweep(queries, k, nprobes)
      val denom = truth.groupBy("qid").agg(count(lit(1)).as("_n"))
      val inter = sweep.select("np", "qid", "id")
        .join(truth.select("qid", "id"), Seq("qid", "id"))
        .groupBy("np", "qid").agg(count(lit(1)).as("_i"))
      val recalls = nprobes.toDF("np").crossJoin(denom)
        .join(inter, Seq("np", "qid"), "left")
        .groupBy("np")
        .agg(avg(coalesce(col("_i"), lit(0L)).cast("double") /
          col("_n").cast("double")).as("recall"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val minRank = idx.probedListMinRank(queries, nprobes.max)
      nprobes.map { np =>
        val frac = minRank.collect { case (l, pr) if pr < np =>
          listSizes.getOrElse(l, 0L) }.sum / total
        OperatingPoint(np, recalls.getOrElse(np, 0.0), frac)
      }
    } finally { truth.unpersist() }
  }

  /** Pareto-optimal subset: no other point has >= recall at <= cost. */
  def paretoFront(points: Seq[OperatingPoint]): Seq[OperatingPoint] =
    points.filter { p =>
      !points.exists(q => (q.recall > p.recall && q.scannedFrac <= p.scannedFrac) ||
        (q.recall >= p.recall && q.scannedFrac < p.scannedFrac))
    }.sortBy(_.scannedFrac)
}
