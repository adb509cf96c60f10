package graft.core

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantizer kernels (faiss/impl/ProductQuantizer.h:25-137):
  * d-dim vectors split into M contiguous dsub-dim subvectors, each
  * encoded as the index of its nearest subspace centroid. codebooks
  * layout: [M][ksub][dsub]. */
object PqKernels {

  def encode(a: ArrayData, cb: Array[Array[Array[Float]]]): Array[Byte] = {
    val m = cb.length
    val dsub = cb(0)(0).length
    val out = new Array[Byte](m)
    var mi = 0
    while (mi < m) {
      val base = mi * dsub
      var best = 0; var bestD = Double.MaxValue
      var j = 0
      while (j < cb(mi).length) {
        val c = cb(mi)(j)
        var s = 0.0; var i = 0
        while (i < dsub) {
          val d = a.getFloat(base + i).toDouble - c(i)
          s += d * d; i += 1
        }
        if (s < bestD) { bestD = s; best = j }
        j += 1
      }
      out(mi) = best.toByte
      mi += 1
    }
    out
  }

  def decode(code: Array[Byte], cb: Array[Array[Array[Float]]]): Array[Float] = {
    val m = cb.length
    val dsub = cb(0)(0).length
    val out = new Array[Float](m * dsub)
    var mi = 0
    while (mi < m) {
      val c = cb(mi)(code(mi) & 0xff)
      System.arraycopy(c, 0, out, mi * dsub, dsub)
      mi += 1
    }
    out
  }

  /** Per-query ADC lookup table (compute_distance_table,
    * ProductQuantizer.h:124): LUT[m*ksub + j] = ||q_sub_m - cb[m][j]||². */
  def lut(q: ArrayData, cb: Array[Array[Array[Float]]]): Array[Double] = {
    val m = cb.length
    val ksub = cb(0).length
    val dsub = cb(0)(0).length
    val out = new Array[Double](m * ksub)
    var mi = 0
    while (mi < m) {
      val base = mi * dsub
      var j = 0
      while (j < ksub) {
        val c = cb(mi)(j)
        var s = 0.0; var i = 0
        while (i < dsub) {
          val d = q.getFloat(base + i).toDouble - c(i)
          s += d * d; i += 1
        }
        out(mi * ksub + j) = s
        j += 1
      }
      mi += 1
    }
    out
  }

  /** ADC distance from a precomputed LUT: M array lookups + adds per
    * candidate (the tight scan loop of IndexPQ/IndexIVFPQ search). */
  def adcFromLut(code: Array[Byte], lut: ArrayData, ksub: Int): Double = {
    var s = 0.0; var mi = 0
    while (mi < code.length) {
      s += lut.getDouble(mi * ksub + (code(mi) & 0xff))
      mi += 1
    }
    s
  }
}

/** Assignment of one subvector within subspace `left` (int m) to its
  * nearest codebook entry — the per-subspace Lloyd assign step. */
case class PQSubAssign(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Float]]])
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "pq_sub_assign"
  override def nullSafeEval(m: Any, sub: Any): Any = {
    val mi = m.asInstanceOf[Int]
    val a = sub.asInstanceOf[ArrayData]
    val cb = codebooks(mi)
    var best = 0; var bestD = Double.MaxValue
    var j = 0
    while (j < cb.length) {
      val c = cb(j)
      var s = 0.0; var i = 0
      while (i < c.length) {
        val d = a.getFloat(i).toDouble - c(i); s += d * d; i += 1
      }
      if (s < bestD) { bestD = s; best = j }
      j += 1
    }
    best
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class PQEncode(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"
  override def nullSafeEval(v: Any): Any =
    PqKernels.encode(v.asInstanceOf[ArrayData], codebooks)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class PQDecode(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pq_decode"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(PqKernels.decode(v.asInstanceOf[Array[Byte]], codebooks))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-query LUT column (computed once per query row, broadcast with
  * the query side of the join — faiss use_precomputed_table spirit,
  * IndexIVFPQ.h:49). */
case class PQLut(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(PqKernels.lut(v.asInstanceOf[ArrayData], codebooks))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** left = code (binary), right = lut (array<double>). */
case class PQAdcFromLut(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"
  override def nullSafeEval(code: Any, lut: Any): Any =
    PqKernels.adcFromLut(code.asInstanceOf[Array[Byte]], lut.asInstanceOf[ArrayData], ksub)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
