package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.shim
import graft.core._

/** Public column-level API of the engine: distance expressions, vector
  * helpers and the top-k aggregate — faiss's scalar-function surface
  * (faiss/utils/distances.h, faiss/utils/extra_distances-inl.h,
  * faiss/utils/hamming.h) re-expressed as codegen'd Catalyst
  * expressions.
  */
object functions {

  /** Squared L2 distance (faiss METRIC_L2 is squared, MetricType.h:22). */
  def l2sq(a: Column, b: Column): Column =
    shim.col(VecDistance(shim.expr(a), shim.expr(b), "l2sq"))

  def inner_product(a: Column, b: Column): Column =
    shim.col(VecDistance(shim.expr(a), shim.expr(b), "ip"))

  def cosine_sim(a: Column, b: Column): Column =
    shim.col(VecDistance(shim.expr(a), shim.expr(b), "cosine"))

  def l1_dist(a: Column, b: Column): Column =
    shim.col(VecDistance(shim.expr(a), shim.expr(b), "l1"))

  def linf_dist(a: Column, b: Column): Column =
    shim.col(VecDistance(shim.expr(a), shim.expr(b), "linf"))

  /** Lp^p distance with metric_arg = p (faiss METRIC_Lp, Index.h:81). */
  def lp_dist(a: Column, b: Column, p: Double): Column =
    shim.col(VecDistance(shim.expr(a), shim.expr(b), "lp", p))

  def canberra_dist(a: Column, b: Column): Column =
    shim.col(VecDistance(shim.expr(a), shim.expr(b), "canberra"))

  def braycurtis_dist(a: Column, b: Column): Column =
    shim.col(VecDistance(shim.expr(a), shim.expr(b), "braycurtis"))

  def jensenshannon_dist(a: Column, b: Column): Column =
    shim.col(VecDistance(shim.expr(a), shim.expr(b), "jensenshannon"))

  /** Generic dispatch by metric name (see [[graft.core.Metric]]) over
    * FLOAT vectors — "jaccard"/"hamming" here are the MyScale fork's
    * float-enum metrics (faiss/MetricType.h:27-28), generalized
    * sum-min/sum-max Jaccard and mismatch-count Hamming. Packed
    * BinaryType codes use [[hamming_dist]] / [[jaccard_dist]]. */
  def vec_dist(a: Column, b: Column, metric: String, metricArg: Double = 0.0): Column =
    shim.col(VecDistance(shim.expr(a), shim.expr(b), metric, metricArg))

  /** Hamming distance over packed BinaryType codes. */
  def hamming_dist(a: Column, b: Column): Column =
    shim.col(HammingDistance(shim.expr(a), shim.expr(b)))

  /** Binary Jaccard distance over packed BinaryType codes. */
  def jaccard_dist(a: Column, b: Column): Column =
    shim.col(JaccardDistance(shim.expr(a), shim.expr(b)))

  def norm_l2(a: Column): Column = shim.col(VecNorm(shim.expr(a), squared = false))
  def norm_l2sq(a: Column): Column = shim.col(VecNorm(shim.expr(a), squared = true))
  def normalize_l2(a: Column): Column = shim.col(NormalizeL2(shim.expr(a)))
  def vec_sub(a: Column, b: Column): Column = shim.col(VecSub(shim.expr(a), shim.expr(b)))
  def vec_add(a: Column, b: Column): Column = shim.col(VecAdd(shim.expr(a), shim.expr(b)))

  /** Sign-bit binarization to a packed BinaryType code (LSH). */
  def sign_bits(a: Column): Column = shim.col(SignBits(shim.expr(a)))

  /** kmin/kmax (faiss python/extra_wrappers.py:22,40): per-row top-k
    * of a score array, as (value, index) structs — index is 0-based
    * like the reference. Built from codegen'd array builtins. */
  def kmin(scores: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    slice(array_sort(zip_with(scores,
      sequence(lit(0), size(scores) - 1),
      (v, i) => struct(v.as("value"), i.as("index")))), 1, k)
  }

  def kmax(scores: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    slice(reverse(array_sort(zip_with(scores,
      sequence(lit(0), size(scores) - 1),
      (v, i) => struct(v.as("value"), i.as("index"))))), 1, k)
  }

  /** 64-bit SimHash of a token array (near-dup fingerprint). */
  def simhash64(tokens: Column): Column = shim.col(SimHash64(shim.expr(tokens)))

  /** Top-k-per-group aggregate over (score, id); `asc=true` keeps the
    * smallest scores. Returns array<struct<id,dist>> best-to-worst.
    * Partial aggregation = faiss per-thread heaps + merge. */
  def topk(score: Column, id: Column, k: Int, asc: Boolean = true): Column =
    shim.agg(TopKAgg(shim.expr(score), shim.expr(id), k, asc))

  /** Register SQL names for the expressions on an existing session
    * (usable via spark.sql). Cluster-wide installs use
    * `spark.sql.extensions=graft.GraftExtensions` instead — both
    * share [[GraftExtensions.all]]. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    GraftExtensions.all.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}
