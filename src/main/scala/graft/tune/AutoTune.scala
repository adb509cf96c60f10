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
    val truth = Knn.knnJoin(queries, base, k).cache()
    val listSizes = idx.invlists.groupBy("list_no").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = listSizes.values.sum.toDouble
    try {
      nprobes.map { np =>
        val rec = Recall.mean(truth, idx.search(queries, k, np))
        // scan-cost proxy: mass of the probed lists relative to the base
        val probed = idx.probedListNos(queries, np)
        val frac = probed.map(l => listSizes.getOrElse(l, 0L)).sum / total
        OperatingPoint(np, rec, frac)
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
