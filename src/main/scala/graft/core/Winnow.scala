package graft.core

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static eval kernel for [[WinnowFingerprints]] in a lone object so
  * the generated Java calls it as one invokestatic (the TextKernels
  * pattern — this was a `CodegenFallback` until r20, breaking the
  * WholeStageCodegen span around the per-doc fingerprint projection). */
object WinnowKernels {
  private val P = 2147483647L // 2^31 - 1
  private val B = 256L

  def fingerprints(v: UTF8String, k: Int, w: Int): GenericArrayData = {
    // B^(k-1) mod P (k-2 multiplies per row — noise next to the hash loop)
    var bk1 = 1L
    var m = 0
    while (m < k - 1) { bk1 = bk1 * B % P; m += 1 }
    // hash over CODE POINTS, not UTF-16 units: the SQL oracle's
    // ord(substring(...)) and length() count code points, so surrogate
    // pairs must be one symbol on both sides
    val cp = v.toString.codePoints().toArray
    val n = cp.length
    val numH = n - k + 1
    if (numH < w) return new GenericArrayData(Array.empty[Any])
    val h = new Array[Long](numH)
    var acc = 0L
    var i = 0
    while (i < k) { acc = (acc * B + cp(i)) % P; i += 1 }
    h(0) = acc
    i = 1
    while (i < numH) {
      acc = ((acc - cp(i - 1) * bk1 % P + P) % P * B + cp(i + k - 1)) % P
      h(i) = acc
      i += 1
    }
    // winnow: min of each w-window, rightmost on ties; dedupe on
    // (pos) — the same (pos, fp) re-selected by overlapping windows
    // is recorded once
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var lastPos = -1
    var t = 0
    while (t <= numH - w) {
      var best = t
      var j = t + 1
      while (j < t + w) {
        if (h(j) <= h(best)) best = j
        j += 1
      }
      if (best != lastPos) {
        out += InternalRow(best + 1, h(best)) // 1-based pos for SQL parity
        lastPos = best
      }
      t += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken:
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD 2003 — the MOSS scheme): Rabin-Karp rolling hashes of every
  * k-char window, then per sliding window of w consecutive hashes keep
  * the minimum (rightmost on ties). Guarantees every match of length
  * >= k + w - 1 shares a fingerprint, with O(n/w) fingerprints per
  * doc — the local, position-aware complement of the whole-content
  * hash ([[graft.llm.TextFunctions.fingerprint]]) and the
  * set-similarity signatures (MinHash/SimHash).
  *
  * Hash = polynomial code over UTF-16 units, base 256 mod 2^31 − 1 —
  * chosen so the DuckDB oracle can replay the exact integers with
  * int64 arithmetic (sum of 8 char·2^31 terms < 2^63). Maintained
  * incrementally (true rolling: one add, one subtract, one multiply
  * per step) but mathematically equal to the windowed polynomial the
  * oracle computes.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 1)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(v: Any): Any =
    WinnowKernels.fingerprints(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.WinnowKernels.fingerprints($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
