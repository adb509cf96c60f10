package graft.core

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-dimension (min, max) aggregate — ScalarQuantizer RS_minmax
  * training (faiss/impl/ScalarQuantizer.cpp:452-476 train_Uniform /
  * :576 train_NonUniform). Output struct(mins array<double>,
  * maxs array<double>). */
final class MinMaxBuf(var mins: Array[Double], var maxs: Array[Double]) {
  def add(a: ArrayData): Unit = {
    val n = a.numElements()
    if (mins == null) {
      mins = Array.fill(n)(Double.MaxValue)
      maxs = Array.fill(n)(Double.MinValue)
    }
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      if (x < mins(i)) mins(i) = x
      if (x > maxs(i)) maxs(i) = x
      i += 1
    }
  }
  def merge(o: MinMaxBuf): Unit = if (o.mins != null) {
    if (mins == null) { mins = o.mins.clone(); maxs = o.maxs.clone() }
    else {
      var i = 0
      while (i < mins.length) {
        if (o.mins(i) < mins(i)) mins(i) = o.mins(i)
        if (o.maxs(i) > maxs(i)) maxs(i) = o.maxs(i)
        i += 1
      }
    }
  }
}

case class VecMinMaxAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinMaxBuf] with UnaryLike[Expression] {

  override def prettyName: String = "vec_minmax"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("mins", ArrayType(DoubleType, containsNull = false)),
    StructField("maxs", ArrayType(DoubleType, containsNull = false))))

  override def createAggregationBuffer(): MinMaxBuf = new MinMaxBuf(null, null)
  override def update(b: MinMaxBuf, in: InternalRow): MinMaxBuf = {
    val v = child.eval(in)
    if (v != null) b.add(v.asInstanceOf[ArrayData]); b
  }
  override def merge(b: MinMaxBuf, o: MinMaxBuf): MinMaxBuf = { b.merge(o); b }
  override def eval(b: MinMaxBuf): Any =
    InternalRow(
      if (b.mins == null) null else new GenericArrayData(b.mins),
      if (b.maxs == null) null else new GenericArrayData(b.maxs))

  override def serialize(b: MinMaxBuf): Array[Byte] = {
    val d = if (b.mins == null) 0 else b.mins.length
    val bb = ByteBuffer.allocate(4 + 16 * d)
    bb.putInt(d)
    var i = 0
    while (i < d) { bb.putDouble(b.mins(i)); bb.putDouble(b.maxs(i)); i += 1 }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): MinMaxBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt
    if (d == 0) new MinMaxBuf(null, null)
    else {
      val mn = new Array[Double](d); val mx = new Array[Double](d)
      var i = 0
      while (i < d) { mn(i) = bb.getDouble; mx(i) = bb.getDouble; i += 1 }
      new MinMaxBuf(mn, mx)
    }
  }
  override def withNewMutableAggBufferOffset(o: Int): VecMinMaxAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecMinMaxAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VecMinMaxAgg =
    copy(child = c)
}

/** SQ8 codec kernels — faiss QuantizerTemplate<Codec8bit, false>
  * (ScalarQuantizer.cpp:269-305): xi = clamp((x - vmin)/vdiff, 0, 1),
  * code = (int)(255 * xi); decode = vmin + (code + 0.5)/255 * vdiff.
  * Math is double precision so the DuckDB oracle reproduces it
  * bit-for-bit (the reference uses float32 — reconstruction differs in
  * the 7th decimal, within the codec's quantization error). */
object SqKernels {
  def encode(a: ArrayData, vmin: Array[Double], vdiff: Array[Double]): Array[Byte] = {
    val d = vmin.length
    val out = new Array[Byte](d)
    var i = 0
    while (i < d) {
      var xi = 0.0
      if (vdiff(i) != 0.0) {
        xi = (a.getFloat(i).toDouble - vmin(i)) / vdiff(i)
        if (xi < 0) xi = 0
        if (xi > 1) xi = 1
      }
      out(i) = (255.0 * xi).toInt.toByte
      i += 1
    }
    out
  }
  def decode(code: Array[Byte], vmin: Array[Double], vdiff: Array[Double]): Array[Double] = {
    val d = vmin.length
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      out(i) = vmin(i) + ((code(i) & 0xff) + 0.5) / 255.0 * vdiff(i)
      i += 1
    }
    out
  }
  /** Asymmetric distance: L2sq between a float query and a decoded
    * code, single pass, no materialized decode. */
  def adcL2sq(q: ArrayData, code: Array[Byte], vmin: Array[Double],
      vdiff: Array[Double]): Double = {
    val d = vmin.length
    var s = 0.0; var i = 0
    while (i < d) {
      val dec = vmin(i) + ((code(i) & 0xff) + 0.5) / 255.0 * vdiff(i)
      val df = q.getFloat(i).toDouble - dec
      s += df * df
      i += 1
    }
    s
  }
  /** codegen entry point (generated code assigns an ArrayData) */
  def decodeData(code: Array[Byte], vmin: Array[Double], vdiff: Array[Double]): ArrayData =
    new GenericArrayData(decode(code, vmin, vdiff))
}

/** SQ4 codec (faiss Codec4bit, ScalarQuantizer.cpp:93-101): 4-bit
  * codes packed two per byte; xi as in SQ8, code = (int)(15 * xi),
  * decode = (code + 0.5)/15. */
object Sq4Kernels {
  def encode(a: ArrayData, vmin: Array[Double], vdiff: Array[Double]): Array[Byte] = {
    val d = vmin.length
    val out = new Array[Byte]((d + 1) / 2)
    var i = 0
    while (i < d) {
      var xi = 0.0
      if (vdiff(i) != 0.0) {
        xi = (a.getFloat(i).toDouble - vmin(i)) / vdiff(i)
        if (xi < 0) xi = 0
        if (xi > 1) xi = 1
      }
      val code = (15.0 * xi).toInt
      out(i >> 1) = (out(i >> 1) | (code << ((i & 1) << 2))).toByte
      i += 1
    }
    out
  }
  def decode(code: Array[Byte], vmin: Array[Double], vdiff: Array[Double]): Array[Double] = {
    val d = vmin.length
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      val c = (code(i >> 1) >> ((i & 1) << 2)) & 0xf
      out(i) = vmin(i) + (c + 0.5) / 15.0 * vdiff(i)
      i += 1
    }
    out
  }
  /** codegen entry point (generated code assigns an ArrayData) */
  def decodeData(code: Array[Byte], vmin: Array[Double], vdiff: Array[Double]): ArrayData =
    new GenericArrayData(decode(code, vmin, vdiff))
}

case class SQ4Encode(child: Expression, vmin: Array[Double], vdiff: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "sq4_encode"
  override def nullSafeEval(v: Any): Any =
    Sq4Kernels.encode(v.asInstanceOf[ArrayData], vmin, vdiff)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("vmin", vmin, "double[]")
    val df = ctx.addReferenceObj("vdiff", vdiff, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.core.Sq4Kernels.encode($c, $mn, $df)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class SQ4Decode(child: Expression, vmin: Array[Double], vdiff: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sq4_decode"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(Sq4Kernels.decode(v.asInstanceOf[Array[Byte]], vmin, vdiff))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("vmin", vmin, "double[]")
    val df = ctx.addReferenceObj("vdiff", vdiff, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.core.Sq4Kernels.decodeData($c, $mn, $df)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** SQ6 codec (faiss Codec6bit, ScalarQuantizer.cpp:127-198): 6-bit
  * codes packed four per three bytes; code = (int)(63 * xi),
  * decode = (code + 0.5)/63. */
object Sq6Kernels {
  def encode(a: ArrayData, vmin: Array[Double], vdiff: Array[Double]): Array[Byte] = {
    val d = vmin.length
    val out = new Array[Byte]((d * 6 + 7) / 8)
    var i = 0
    while (i < d) {
      var xi = 0.0
      if (vdiff(i) != 0.0) {
        xi = (a.getFloat(i).toDouble - vmin(i)) / vdiff(i)
        if (xi < 0) xi = 0
        if (xi > 1) xi = 1
      }
      val bits = (63.0 * xi).toInt
      val base = (i >> 2) * 3
      (i & 3) match {
        case 0 => out(base) = (out(base) | bits).toByte
        case 1 =>
          out(base) = (out(base) | (bits << 6)).toByte
          out(base + 1) = (out(base + 1) | (bits >> 2)).toByte
        case 2 =>
          out(base + 1) = (out(base + 1) | (bits << 4)).toByte
          out(base + 2) = (out(base + 2) | (bits >> 4)).toByte
        case 3 => out(base + 2) = (out(base + 2) | (bits << 2)).toByte
      }
      i += 1
    }
    out
  }
  def decode(code: Array[Byte], vmin: Array[Double], vdiff: Array[Double]): Array[Double] = {
    val d = vmin.length
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      val base = (i >> 2) * 3
      val bits = (i & 3) match {
        case 0 => code(base) & 0x3f
        case 1 => (((code(base) & 0xff) >> 6) | ((code(base + 1) & 0xff) << 2)) & 0x3f
        case 2 => (((code(base + 1) & 0xff) >> 4) | ((code(base + 2) & 0xff) << 4)) & 0x3f
        case 3 => ((code(base + 2) & 0xff) >> 2) & 0x3f
      }
      out(i) = vmin(i) + (bits + 0.5) / 63.0 * vdiff(i)
      i += 1
    }
    out
  }
  /** codegen entry point (generated code assigns an ArrayData) */
  def decodeData(code: Array[Byte], vmin: Array[Double], vdiff: Array[Double]): ArrayData =
    new GenericArrayData(decode(code, vmin, vdiff))
}

/** Fused asymmetric L2sq against each packed-code width — the same
  * single-pass decode-in-the-distance as [[SqKernels.adcL2sq]]
  * (faiss DCTemplate, impl/ScalarQuantizerDC.h): no materialized
  * decode array in the scan loop. */
object SqAdcKernels {
  def l2sq4(q: ArrayData, code: Array[Byte], vmin: Array[Double],
      vdiff: Array[Double]): Double = {
    val d = vmin.length
    var s = 0.0; var i = 0
    while (i < d) {
      val c = (code(i >> 1) >> ((i & 1) << 2)) & 0xf
      val dec = vmin(i) + (c + 0.5) / 15.0 * vdiff(i)
      val df = q.getFloat(i).toDouble - dec
      s += df * df
      i += 1
    }
    s
  }
  def l2sq6(q: ArrayData, code: Array[Byte], vmin: Array[Double],
      vdiff: Array[Double]): Double = {
    val d = vmin.length
    var s = 0.0; var i = 0
    while (i < d) {
      val base = (i >> 2) * 3
      val bits = (i & 3) match {
        case 0 => code(base) & 0x3f
        case 1 => ((code(base) & 0xc0) >> 6) | ((code(base + 1) & 0x0f) << 2)
        case 2 => ((code(base + 1) & 0xf0) >> 4) | ((code(base + 2) & 0x03) << 4)
        case _ => (code(base + 2) & 0xfc) >> 2
      }
      val dec = vmin(i) + (bits + 0.5) / 63.0 * vdiff(i)
      val df = q.getFloat(i).toDouble - dec
      s += df * df
      i += 1
    }
    s
  }
  def l2fp16(q: ArrayData, code: Array[Byte]): Double = {
    val bb = ByteBuffer.wrap(code)
    val d = code.length / 2
    var s = 0.0; var i = 0
    while (i < d) {
      val df = q.getFloat(i).toDouble - Fp16Kernels.fromHalf(bb.getShort).toDouble
      s += df * df
      i += 1
    }
    s
  }
}

case class SQ4AdcL2(left: Expression, right: Expression,
    vmin: Array[Double], vdiff: Array[Double])
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq4_adc_l2sq"
  override def nullSafeEval(q: Any, c: Any): Any =
    SqAdcKernels.l2sq4(q.asInstanceOf[ArrayData], c.asInstanceOf[Array[Byte]], vmin, vdiff)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("vmin", vmin, "double[]")
    val df = ctx.addReferenceObj("vdiff", vdiff, "double[]")
    defineCodeGen(ctx, ev, (q, c) => s"graft.core.SqAdcKernels.l2sq4($q, $c, $mn, $df)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class SQ6AdcL2(left: Expression, right: Expression,
    vmin: Array[Double], vdiff: Array[Double])
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq6_adc_l2sq"
  override def nullSafeEval(q: Any, c: Any): Any =
    SqAdcKernels.l2sq6(q.asInstanceOf[ArrayData], c.asInstanceOf[Array[Byte]], vmin, vdiff)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("vmin", vmin, "double[]")
    val df = ctx.addReferenceObj("vdiff", vdiff, "double[]")
    defineCodeGen(ctx, ev, (q, c) => s"graft.core.SqAdcKernels.l2sq6($q, $c, $mn, $df)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class Fp16AdcL2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "fp16_adc_l2sq"
  override def nullSafeEval(q: Any, c: Any): Any =
    SqAdcKernels.l2fp16(q.asInstanceOf[ArrayData], c.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (q, c) => s"graft.core.SqAdcKernels.l2fp16($q, $c)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class SQ6Encode(child: Expression, vmin: Array[Double], vdiff: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "sq6_encode"
  override def nullSafeEval(v: Any): Any =
    Sq6Kernels.encode(v.asInstanceOf[ArrayData], vmin, vdiff)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("vmin", vmin, "double[]")
    val df = ctx.addReferenceObj("vdiff", vdiff, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.core.Sq6Kernels.encode($c, $mn, $df)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class SQ6Decode(child: Expression, vmin: Array[Double], vdiff: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sq6_decode"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(Sq6Kernels.decode(v.asInstanceOf[Array[Byte]], vmin, vdiff))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("vmin", vmin, "double[]")
    val df = ctx.addReferenceObj("vdiff", vdiff, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.core.Sq6Kernels.decodeData($c, $mn, $df)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** fp16 codec (faiss QT_fp16, ScalarQuantizer.cpp QuantizerFP16 /
  * utils/fp16.h): IEEE 754 half-precision format with
  * round-to-nearest, ties UP in magnitude (the `+ 0x1000` bit-add
  * below has no even-fixup). DELIBERATE divergence from the
  * reference's hardware RNE: ties-up is exactly what the DuckDB
  * oracles' `floor(y + 0.5)` grid replays (fp16_roundtrip /
  * minmax_roundtrip), so values landing exactly on a half-precision
  * tie round identically on both sides; under RNE they would differ
  * by a full half-ulp — far beyond the compare tolerance (ADVICE r9).
  * Exact-tie parity with faiss itself is seeded-float-parity
  * territory (SURVEY §7 non-goal); every non-tie value matches. The
  * tie direction is pinned by SqCodecSpec. */
object Fp16Kernels {
  def toHalf(f: Float): Short = {
    val bits = java.lang.Float.floatToIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    var value = (bits & 0x7fffffff) + 0x1000 // round-to-nearest (ties up)
    if (value >= 0x47800000) { // overflow -> inf (or NaN passthrough)
      if ((bits & 0x7fffffff) >= 0x47800000) {
        if ((bits & 0x7fffffff) < 0x7f800000) return (sign | 0x7c00).toShort
        return (sign | 0x7c00 | ((bits & 0x007fffff) >> 13)).toShort
      }
      return (sign | 0x7bff).toShort
    }
    if (value >= 0x38800000) return (sign | ((value - 0x38000000) >> 13)).toShort
    if (value < 0x33000000) return sign.toShort // underflow -> 0
    value = (bits & 0x7fffffff) >> 23
    ((sign | ((((bits & 0x7fffff) | 0x800000) + (0x800000 >>> (value - 102)))
      >> (126 - value)))).toShort
  }
  def fromHalf(h: Short): Float = {
    val hh = h & 0xffff
    val sign = (hh & 0x8000) << 16
    val exp = (hh >> 10) & 0x1f
    val mant = hh & 0x3ff
    if (exp == 0) {
      if (mant == 0) return java.lang.Float.intBitsToFloat(sign)
      // subnormal
      var e = -1; var m = mant
      do { e += 1; m <<= 1 } while ((m & 0x400) == 0)
      return java.lang.Float.intBitsToFloat(
        sign | ((127 - 15 - e) << 23) | ((m & 0x3ff) << 13))
    }
    if (exp == 0x1f)
      return java.lang.Float.intBitsToFloat(sign | 0x7f800000 | (mant << 13))
    java.lang.Float.intBitsToFloat(sign | ((exp - 15 + 127) << 23) | (mant << 13))
  }
  def encode(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val bb = ByteBuffer.allocate(2 * n)
    var i = 0
    while (i < n) { bb.putShort(toHalf(a.getFloat(i))); i += 1 }
    bb.array()
  }
  def decode(code: Array[Byte]): Array[Float] = {
    val bb = ByteBuffer.wrap(code)
    val out = new Array[Float](code.length / 2)
    var i = 0
    while (i < out.length) { out(i) = fromHalf(bb.getShort); i += 1 }
    out
  }
  /** codegen entry point (generated code assigns an ArrayData) */
  def decodeData(code: Array[Byte]): ArrayData = new GenericArrayData(decode(code))
}

case class Fp16Encode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "fp16_encode"
  override def nullSafeEval(v: Any): Any = Fp16Kernels.encode(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Fp16Kernels.encode($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class Fp16Decode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "fp16_decode"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(Fp16Kernels.decode(v.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Fp16Kernels.decodeData($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class SQEncode(child: Expression, vmin: Array[Double], vdiff: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "sq8_encode"
  override def nullSafeEval(v: Any): Any =
    SqKernels.encode(v.asInstanceOf[ArrayData], vmin, vdiff)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("vmin", vmin, "double[]")
    val df = ctx.addReferenceObj("vdiff", vdiff, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.core.SqKernels.encode($c, $mn, $df)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class SQDecode(child: Expression, vmin: Array[Double], vdiff: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sq8_decode"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(SqKernels.decode(v.asInstanceOf[Array[Byte]], vmin, vdiff))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("vmin", vmin, "double[]")
    val df = ctx.addReferenceObj("vdiff", vdiff, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.core.SqKernels.decodeData($c, $mn, $df)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** dist(query float vec, SQ8 code) without materializing the decode. */
case class SQAdcL2(left: Expression, right: Expression,
    vmin: Array[Double], vdiff: Array[Double])
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq8_adc_l2sq"
  override def nullSafeEval(q: Any, c: Any): Any =
    SqKernels.adcL2sq(q.asInstanceOf[ArrayData], c.asInstanceOf[Array[Byte]], vmin, vdiff)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("vmin", vmin, "double[]")
    val df = ctx.addReferenceObj("vdiff", vdiff, "double[]")
    defineCodeGen(ctx, ev, (q, c) => s"graft.core.SqKernels.adcL2sq($q, $c, $mn, $df)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dense mat-vec y = A x (+ b): the LinearTransform core
  * (faiss/VectorTransform.h:73). Output double for oracle parity. */
object MatVecKernels {
  def apply(a: ArrayData, matrix: Array[Array[Float]], bias: Array[Float]): ArrayData = {
    val dOut = matrix.length
    val out = new Array[Double](dOut)
    var j = 0
    while (j < dOut) {
      val row = matrix(j)
      var s = 0.0
      var i = 0
      while (i < row.length) { s += row(i).toDouble * a.getFloat(i).toDouble; i += 1 }
      // bias added AFTER the product sum so the DuckDB sidecar replay
      // (list_aggregate sum + bias) is the same double association
      if (bias != null) s += bias(j).toDouble
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class MatVec(child: Expression, matrix: Array[Array[Float]],
    bias: Array[Float] = null)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "mat_vec"
  override def nullSafeEval(v: Any): Any =
    MatVecKernels(v.asInstanceOf[ArrayData], matrix, bias)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("matrix", matrix, "float[][]")
    val b = ctx.addReferenceObj("bias", bias, "float[]")
    defineCodeGen(ctx, ev, c => s"graft.core.MatVecKernels.apply($c, $m, $b)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
