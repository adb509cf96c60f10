package graft.core

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused text kernels for the MinHash/shingle pipeline.
  *
  * Why these exist: the original pipeline composed Spark builtins
  * (`split` → `transform`/`sequence` → `array_distinct`) under
  * CodegenFallback minhash expressions, so the whole per-row hot loop
  * ran through the INTERPRETED `Expression.eval` tree — megamorphic
  * call sites (`TernaryExpression.eval`, `ArrayTransform.nullSafeEval`,
  * per-access `InternalRow.getAccessor` resolution) that C2
  * speculates on and repeatedly deoptimizes. Profiled in the r07
  * driver bench: the identical query ranged 148 → 7,989 core-seconds
  * across sessions (54×) purely on JIT luck (2,006 deopt events in a
  * 50 s JFR window, `jit_ms` ≈ wall). A single static kernel per row
  * is a small, stable, monomorphic loop: janino emits one
  * invokestatic, C2 compiles it once, and the cost is deterministic.
  *
  * Semantics are bit-identical to the builtin chain they replace
  * (same tokenization incl. empty fields, same first-occurrence
  * distinct order, same md5-prefix base hash and permutation
  * constants as [[MinHashSig]]), so the DuckDB oracle SQL replaying
  * that chain is unchanged.
  *
  * Re-expresses the reference's one-pass dedup signature computation
  * (myscale/faiss has no text path; the LSH banding mirrors
  * faiss/IndexLSH.h:21's hash-bucket design over shingle space).
  */
object TextKernels {

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Token boundaries of `text` split on the literal single space,
    * keeping empty fields (Spark `split(text, " ", -1)` semantics:
    * leading/consecutive/trailing spaces all yield empty tokens).
    * Returns flat (start, end) byte-offset pairs; 0x20 never occurs
    * inside a UTF-8 multibyte sequence, so byte scanning is safe. */
  private def tokenOffsets(bytes: Array[Byte], off: Int, len: Int): Array[Int] = {
    var nTok = 1
    var i = 0
    while (i < len) { if (bytes(off + i) == ' ') nTok += 1; i += 1 }
    val out = new Array[Int](2 * nTok)
    var t = 0
    var start = 0
    i = 0
    while (i < len) {
      if (bytes(off + i) == ' ') {
        out(2 * t) = start; out(2 * t + 1) = i
        t += 1; start = i + 1
      }
      i += 1
    }
    out(2 * t) = start; out(2 * t + 1) = len
    out
  }

  /** Distinct word n-gram shingles (first-occurrence order), identical
    * to `array_distinct(transform(sequence(0, size(toks)-n),
    * i -> concat_ws(" ", slice(toks, i+1, n))))`. Tokens split on a
    * single space are separated by exactly one 0x20 byte, so the
    * joined n-gram IS the contiguous byte span from token i's start
    * to token (i+n-1)'s end — each shingle is a zero-copy slice. */
  def shingleSet(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes // materialized copy iff text is off-heap/offset
    val offs = tokenOffsets(bytes, 0, bytes.length)
    val nTok = offs.length / 2
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val nSh = nTok - n + 1
    val seen = new java.util.LinkedHashSet[UTF8String](nSh * 2)
    var i = 0
    while (i < nSh) {
      val s = offs(2 * i)
      val e = offs(2 * (i + n - 1) + 1)
      seen.add(UTF8String.fromBytes(bytes, s, e - s))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** First 15 hex digits of md5 (= bytes 0..6 + high nibble of byte
    * 7) as a 60-bit long — the `conv(substring(md5(x),1,15),16,10)`
    * value without materializing the 32-char hex string. */
  private def md5Prefix60(md: java.security.MessageDigest,
      bytes: Array[Byte], off: Int, len: Int): Long = {
    md.reset()
    md.update(bytes, off, len)
    val dig = md.digest()
    var h = 0L
    var b = 0
    while (b < 7) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
    (h << 4) | ((dig(7) >> 4) & 0xfL)
  }

  /** [[md5Prefix60]] over a whole UTF8String (the 60-bit content-hash
    * id derivation used by the at-scale derived vector table; parity
    * with DuckDB's `('0x' || substr(md5(x),1,15))::BIGINT`). */
  def md5Prefix60(text: UTF8String): Long = {
    val bytes = text.getBytes
    md5Prefix60(md5Local.get(), bytes, 0, bytes.length)
  }

  /** The [[MinHashSig]] base hash of one byte span: [[md5Prefix60]]
    * mod [[MinHashSig.M]]. */
  private def baseHash(md: java.security.MessageDigest,
      bytes: Array[Byte], off: Int, len: Int): Long =
    md5Prefix60(md, bytes, off, len) % MinHashSig.M

  /** Fused text → LSH band hashes: shingle (distinct spans), base-hash
    * each distinct shingle once, min-reduce the `hashes` permutations,
    * then md5 each band's `r` signature components joined by '|' as
    * decimal strings (nulls skipped — matches `md5(concat_ws("|",
    * slice(sig, ...).cast("array<string>")))` and the oracle's
    * `md5(array_to_string(sg[...], '|'))`). Output: `bands` lowercase
    * 32-char hex strings. One invokestatic per row replaces the
    * interpreted split/transform/distinct tree + 2 CodegenFallback
    * evals + an interpreted 4-element lambda. */
  def minhashBands(text: UTF8String, ngram: Int, hashes: Int, bands: Int): ArrayData = {
    val md = md5Local.get()
    val bytes = text.getBytes
    val offs = tokenOffsets(bytes, 0, bytes.length)
    val nTok = offs.length / 2
    // distinct shingle base hashes (distinct on CONTENT, i.e. the span
    // bytes — two equal shingles share one base hash, as in the
    // array_distinct chain)
    val sig = new Array[Long](hashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    if (nTok >= ngram) {
      val nSh = nTok - ngram + 1
      val seen = new java.util.HashSet[UTF8String](nSh * 2)
      var i = 0
      while (i < nSh) {
        val s = offs(2 * i)
        val e = offs(2 * (i + ngram - 1) + 1)
        if (seen.add(UTF8String.fromBytes(bytes, s, e - s))) {
          val h = baseHash(md, bytes, s, e - s)
          var j = 0
          while (j < hashes) {
            val p = (h * MinHashSig.a(j) + MinHashSig.b(j)) % MinHashSig.P
            if (p < sig(j)) sig(j) = p
            j += 1
          }
        }
        i += 1
      }
    }
    new GenericArrayData(bandsFromSig(md, sig, hashes, bands))
  }

  /** Band md5 hex strings from a min-reduced signature (shared tail of
    * [[minhashBands]] / [[minhashBandsAndSet]]). */
  private def bandsFromSig(md: java.security.MessageDigest,
      sig: Array[Long], hashes: Int, bands: Int): Array[Any] = {
    val r = hashes / bands
    val sb = new java.lang.StringBuilder(r * 11)
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var k = 0
      var first = true
      while (k < r) {
        val v = sig(b * r + k)
        if (v != Long.MaxValue) { // null component (empty doc): skipped by concat_ws
          if (!first) sb.append('|')
          sb.append(v)
          first = false
        }
        k += 1
      }
      md.reset()
      val dig = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Byte](32)
      var d = 0
      while (d < 16) {
        hex(2 * d) = hexDigits((dig(d) >> 4) & 0xf).toByte
        hex(2 * d + 1) = hexDigits(dig(d) & 0xf).toByte
        d += 1
      }
      out(b) = UTF8String.fromBytes(hex)
      b += 1
    }
    out
  }

  /** The band md5s of [[bandsFromSig]] truncated to their 60-bit
    * prefixes — candidate generation only needs band-hash EQUALITY,
    * and long keys make the band-bucket aggregate hash/sort 8-byte
    * values instead of 32-char hex strings. A 60-bit band collision
    * adds a spurious candidate pair that the exact-Jaccard verify
    * then rejects, so the verified pair set is unchanged. */
  private def bandsFromSigLong(md: java.security.MessageDigest,
      sig: Array[Long], hashes: Int, bands: Int): Array[Long] = {
    val r = hashes / bands
    val sb = new java.lang.StringBuilder(r * 11)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var k = 0
      var first = true
      while (k < r) {
        val v = sig(b * r + k)
        if (v != Long.MaxValue) {
          if (!first) sb.append('|')
          sb.append(v)
          first = false
        }
        k += 1
      }
      md.reset()
      val dig = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var d = 0
      while (d < 7) { h = (h << 8) | (dig(d) & 0xffL); d += 1 }
      out(b) = (h << 4) | ((dig(7) >> 4) & 0xfL)
      b += 1
    }
    out
  }

  /** Fused text → (60-bit LSH band hashes, SORTED distinct 60-bit
    * shingle hashes) in one pass. The near-dup verify only needs
    * shingle-set sizes and intersection counts; representing each
    * distinct shingle by its full [[md5Prefix60]] value (the same md5
    * the minhash base hash reduces mod M) lets the verify join ship
    * 8-byte longs instead of shingle strings and intersect by a
    * branch-free sorted merge instead of per-row string hash sets.
    * Two distinct shingles colliding in 60 bits (P ≈ n²·2⁻⁶¹ per doc)
    * would shrink the set by one — negligible against the 4-dp
    * rounding of the reported Jaccard. Band hashes are likewise the
    * 60-bit md5 prefixes ([[bandsFromSigLong]]). */
  def minhashBandsAndHashSet(text: UTF8String, ngram: Int,
      hashes: Int, bands: Int): InternalRow = {
    val md = md5Local.get()
    val bytes = text.getBytes
    val offs = tokenOffsets(bytes, 0, bytes.length)
    val nTok = offs.length / 2
    val sig = new Array[Long](hashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var hashSet: Array[Long] = Array.emptyLongArray
    if (nTok >= ngram) {
      val nSh = nTok - ngram + 1
      val seen = new java.util.HashSet[UTF8String](nSh * 2)
      val hs = new Array[Long](nSh)
      var nh = 0
      var i = 0
      while (i < nSh) {
        val s = offs(2 * i)
        val e = offs(2 * (i + ngram - 1) + 1)
        if (seen.add(UTF8String.fromBytes(bytes, s, e - s))) {
          val full = md5Prefix60(md, bytes, s, e - s)
          hs(nh) = full; nh += 1
          val h = full % MinHashSig.M
          var j = 0
          while (j < hashes) {
            val p = (h * MinHashSig.a(j) + MinHashSig.b(j)) % MinHashSig.P
            if (p < sig(j)) sig(j) = p
            j += 1
          }
        }
        i += 1
      }
      hashSet = java.util.Arrays.copyOf(hs, nh)
      java.util.Arrays.sort(hashSet)
      // drop adjacent duplicates (distinct shingles colliding in 60
      // bits): keeps the array a strict set so the merge intersect is
      // exact set arithmetic
      var w = 0
      var r = 0
      while (r < hashSet.length) {
        if (w == 0 || hashSet(r) != hashSet(w - 1)) { hashSet(w) = hashSet(r); w += 1 }
        r += 1
      }
      if (w != hashSet.length) hashSet = java.util.Arrays.copyOf(hashSet, w)
    }
    new GenericInternalRow(Array[Any](
      ArrayData.toArrayData(bandsFromSigLong(md, sig, hashes, bands)),
      ArrayData.toArrayData(hashSet)))
  }

  /** |a ∩ b| for two SORTED distinct long arrays: single merge pass,
    * no per-row hash set. */
  def sortedLongIntersect(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  /** All ordered pair tails of a SORTED id list: struct(i, tail) per
    * anchor (last anchor's empty tail omitted) — the bucket pair
    * expansion `transform(ids, (x, k) -> struct(x, slice(ids, k+2,
    * n-k-1)))` as ONE codegen'd call instead of an interpreted
    * higher-order-function tree (ArrayTransform/Slice are
    * CodegenFallback; profiled as the hottest stage of the at-scale
    * near-dup candidate join). Same O(B) values per emitted struct,
    * same O(B²) total per bucket — the quadratic candidate OUTPUT is
    * inherent to LSH bucketing. */
  def pairTails(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      val tail = new Array[Long](n - 1 - i)
      var k = 0
      while (k < tail.length) { tail(k) = ids.getLong(i + 1 + k); k += 1 }
      out(i) = new GenericInternalRow(Array[Any](
        ids.getLong(i), ArrayData.toArrayData(tail)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The quality-score formula of
    * [[graft.llm.TextFunctions.qualityScore]] as one kernel call
    * (same double arithmetic and op order; the builtin form runs
    * `filter`/`aggregate` higher-order lambdas interpreted per token).
    * `stopwords` is the expression-captured lookup set. */
  def qualityScore(text: UTF8String, stopwords: java.util.HashSet[UTF8String]): Double = {
    val bytes = text.getBytes
    val offs = tokenOffsets(bytes, 0, bytes.length)
    val nTok = offs.length / 2
    var swCount = 0
    var charSum = 0L
    var i = 0
    while (i < nTok) {
      val s = offs(2 * i); val e = offs(2 * i + 1)
      val tok = UTF8String.fromBytes(bytes, s, e - s)
      if (stopwords.contains(tok)) swCount += 1
      charSum += tok.numChars()
      i += 1
    }
    val lenScore = math.min(text.numChars().toDouble / 500.0, 1.0)
    val swScore = math.min(swCount.toDouble / nTok.toDouble * 5.0, 1.0)
    val tokScore = if (charSum.toDouble / nTok.toDouble <= 8.0) 1.0 else 0.5
    (lenScore + swScore + tokScore) / 3.0
  }
}

/** `shingle_set(text, n)`: distinct word n-gram shingles, codegen'd
  * (single invokestatic; replaces the interpreted
  * split→transform→array_distinct chain). */
case class ShingleSetK(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_set"
  override def nullSafeEval(v: Any): Any =
    TextKernels.shingleSet(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.TextKernels.shingleSet($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `minhash_bands(text, ngram, hashes, bands)`: fused shingle →
  * minhash signature → LSH band hashes, codegen'd. */
case class MinHashBandsK(child: Expression, ngram: Int, hashes: Int, bands: Int)
    extends UnaryExpression {
  require(hashes % bands == 0, "hashes must divide into bands")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_bands"
  override def nullSafeEval(v: Any): Any =
    TextKernels.minhashBands(v.asInstanceOf[UTF8String], ngram, hashes, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.core.TextKernels.minhashBands($c, $ngram, $hashes, $bands)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `minhash_bands_hashset(text, ngram, hashes, bands)`: fused shingle
  * → (60-bit band hashes, sorted distinct 60-bit shingle hashes),
  * codegen'd (see [[TextKernels.minhashBandsAndHashSet]]). */
case class MinHashBandsHashSetK(child: Expression, ngram: Int, hashes: Int, bands: Int)
    extends UnaryExpression {
  require(hashes % bands == 0, "hashes must divide into bands")
  override def dataType: DataType = StructType(Seq(
    StructField("bands", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("sh", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "minhash_bands_hashset"
  override def nullSafeEval(v: Any): Any =
    TextKernels.minhashBandsAndHashSet(v.asInstanceOf[UTF8String], ngram, hashes, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.core.TextKernels.minhashBandsAndHashSet($c, $ngram, $hashes, $bands)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `sorted_long_intersect(a, b)`: |a ∩ b| of two sorted distinct long
  * arrays by one merge pass, codegen'd. */
case class SortedLongIntersectK(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_long_intersect"
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.sortedLongIntersect(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.core.TextKernels.sortedLongIntersect($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `pair_tails(ids)`: bucket pair expansion over a sorted long id
  * list, codegen'd (see [[TextKernels.pairTails]]). */
case class PairTailsK(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("tail", ArrayType(LongType, containsNull = false), nullable = false))),
    containsNull = false)
  override def prettyName: String = "pair_tails"
  override def nullSafeEval(v: Any): Any =
    TextKernels.pairTails(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.TextKernels.pairTails($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `md5_prefix60(text)`: first 60 bits of md5 as a long —
  * `conv(substring(md5(x), 1, 15), 16, 10)::long` without the
  * intermediate hex string, substring, or base-16 parse (DuckDB
  * parity: `('0x' || substr(md5(x), 1, 15))::BIGINT`). */
case class Md5Prefix60K(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"
  override def nullSafeEval(v: Any): Any =
    TextKernels.md5Prefix60(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.TextKernels.md5Prefix60($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `quality_score_k(text)`: the C4/Gopher-style heuristic quality
  * score as one codegen'd kernel call. */
case class QualityScoreK(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quality_score"
  @transient private lazy val swSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](stopwords.size * 2)
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  override def nullSafeEval(v: Any): Any =
    TextKernels.qualityScore(v.asInstanceOf[UTF8String], swSet)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("swSet", swSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.core.TextKernels.qualityScore($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
