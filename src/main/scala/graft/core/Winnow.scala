package graft.core

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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
    extends UnaryExpression with CodegenFallback {
  require(k >= 2 && w >= 1)
  private val P = 2147483647L // 2^31 - 1
  private val B = 256L
  private val Bk1 = { // B^(k-1) mod P
    var r = 1L; var i = 0
    while (i < k - 1) { r = r * B % P; i += 1 }
    r
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(v: Any): Any = {
    // hash over CODE POINTS, not UTF-16 units: the SQL oracle's
    // ord(substring(...)) and length() count code points, so surrogate
    // pairs must be one symbol on both sides
    val cp = v.asInstanceOf[UTF8String].toString.codePoints().toArray
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
      acc = ((acc - cp(i - 1) * Bk1 % P + P) % P * B + cp(i + k - 1)) % P
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
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
