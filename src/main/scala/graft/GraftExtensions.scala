package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.core._

/** Spark-native deployment entry point: set
  * `spark.sql.extensions=graft.GraftExtensions` (cluster config, no
  * code change) and every graft expression is available to pure-SQL
  * users on every session — the idiomatic library surface for a
  * shared cluster, equivalent to [[functions.register]] for an
  * already-built session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (es: Seq[Expression]) => builder(es)))
    }
}

object GraftExtensions {
  /** name -> builder, shared with [[functions.register]]. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "l2sq" -> (es => VecDistance(es(0), es(1), "l2sq")),
    "inner_product" -> (es => VecDistance(es(0), es(1), "ip")),
    "cosine_sim" -> (es => VecDistance(es(0), es(1), "cosine")),
    "hamming_dist" -> (es => HammingDistance(es(0), es(1))),
    "jaccard_dist" -> (es => JaccardDistance(es(0), es(1))),
    "norm_l2" -> (es => VecNorm(es(0), squared = false)),
    "normalize_l2" -> (es => NormalizeL2(es(0))),
    "sign_bits" -> (es => SignBits(es(0))),
    "topk" -> { es =>
      val k = es(2) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"topk k must be a literal int, got $other")
      }
      val asc = es.lift(3) match {
        case Some(Literal(v: Boolean, _)) => v
        case None => true
        case other => throw new IllegalArgumentException(
          s"topk asc must be a literal bool, got $other")
      }
      TopKAgg(es(0), es(1), k, asc).toAggregateExpression()
    })
}
