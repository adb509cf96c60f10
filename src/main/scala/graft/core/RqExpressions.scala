package graft.core

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Residual-quantizer kernels (faiss/impl/ResidualQuantizer.h:22-60,
  * IndexAdditiveQuantizer.h:25): L full-dimension codebooks applied
  * greedily — level l encodes the residual left by levels 0..l-1, and
  * decode is the sum of the selected codewords. This is the beam_size=1
  * greedy path (ResidualQuantizer::train default refine_beam with
  * beam 1 semantics); subspace PQ is the special case where codewords
  * are nonzero on disjoint slices. codebooks layout: [L][k][d]. */
object RqKernels {

  /** Greedy per-level argmin; returns the L code indices. The running
    * residual is kept in float32 (the reference stores residuals in
    * float buffers between levels). */
  def encode(a: ArrayData, cb: Array[Array[Array[Float]]]): Array[Int] = {
    val d = cb(0)(0).length
    val res = new Array[Float](d)
    var i = 0
    while (i < d) { res(i) = a.getFloat(i); i += 1 }
    val out = new Array[Int](cb.length)
    var l = 0
    while (l < cb.length) {
      var best = 0; var bestD = Double.MaxValue
      var j = 0
      while (j < cb(l).length) {
        val c = cb(l)(j)
        var s = 0.0; var k = 0
        while (k < d) { val dv = res(k).toDouble - c(k); s += dv * dv; k += 1 }
        if (s < bestD) { bestD = s; best = j }
        j += 1
      }
      out(l) = best
      val c = cb(l)(best)
      var k = 0
      while (k < d) { res(k) = res(k) - c(k); k += 1 }
      l += 1
    }
    out
  }

  /** Sum of the selected codewords, accumulated in float32 level by
    * level (codeword adds are float in the reference decoder too). */
  def decode(codes: ArrayData, cb: Array[Array[Array[Float]]]): Array[Float] = {
    val d = cb(0)(0).length
    val out = new Array[Float](d)
    var l = 0
    while (l < cb.length) {
      val c = cb(l)(codes.getInt(l))
      var k = 0
      while (k < d) { out(k) = out(k) + c(k); k += 1 }
      l += 1
    }
    out
  }
}

case class RQEncode(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "rq_encode"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(RqKernels.encode(v.asInstanceOf[ArrayData], codebooks))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class RQDecode(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "rq_decode"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(RqKernels.decode(v.asInstanceOf[ArrayData], codebooks))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
