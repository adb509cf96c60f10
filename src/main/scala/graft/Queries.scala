package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim
import graft.functions._
import graft.knn.Knn
import graft.core.{NearestCentroid, VecSumAgg}
import graft.index.IvfIndex
import graft.llm.{Dedup, Multimodal, TextFunctions => TF}

/** The driver-facing query catalog: one entry per implemented operator
  * from SURVEY.md §2, each with an equivalent DuckDB oracle in
  * [[Queries.oracle]].
  *
  * Float policy for oracle parity: every distance is accumulated in
  * double precision (see [[graft.core.VecKernels]]) and ROUNDED to 4
  * decimals in both the Spark output and the DuckDB SQL, so the
  * driver's value-hash compare is deterministic; integer/rank outputs
  * are cast to BIGINT on both sides (SURVEY.md §7 "exact float parity"
  * non-goal).
  */
object Queries extends QueriesBase
    with CatalogCore
    with CatalogCodec
    with CatalogIvfPq
    with CatalogLlm
    with CatalogStreaming
    with CatalogScale
    with CatalogAq {

  /** The full catalog: the per-domain parts concatenated in the
    * original single-file order (order is load-bearing — see the
    * part traits). */
  val catalog: Seq[CatalogEntry] =
    coreEntries ++ codecEntries ++ ivfPqEntries ++ llmEntries ++ streamingEntries ++ scaleEntries ++ aqEntries


  // ListMap: Verify/Bench iterate in CATALOG order, so build-timing
  // queries (ivf_build_big) deterministically precede the searches
  // that reuse their memoized index — search timings measure search.
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(
      catalog.map { case (n, f, _) => n -> f }: _*)

  def oracleSql: Map[String, String] =
    scala.collection.immutable.ListMap(
      catalog.collect { case (n, _, Some(sql)) => n -> sql }: _*)
}
