package graft.core

import org.apache.spark.sql.catalyst.util.ArrayData

/** Scalar distance kernels over Catalyst `ArrayData` of FloatType.
  *
  * All kernels accumulate in double precision with a single
  * left-to-right pass, matching DuckDB's list_distance /
  * list_inner_product semantics on `::DOUBLE[]` casts so the duckdb
  * oracle hash-matches after rounding.
  *
  * Semantics mirror the reference's metric definitions
  * (faiss/MetricType.h:20-34, faiss/utils/distances.h:28-37,
  * faiss/utils/extra_distances-inl.h:29-113): L2 is SQUARED; inner
  * product and cosine are similarities (higher = better); everything
  * else, including jaccard, is a distance (lower = better).
  *
  * These are plain static methods so generated code (whole-stage
  * codegen) can call them directly — one invokestatic per row, no
  * virtual dispatch, no boxing.
  */
object VecKernels {

  def l2sq(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  def ip(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / Math.sqrt(na * nb)
  }

  def l1(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0; var i = 0
    while (i < n) {
      s += Math.abs(a.getFloat(i).toDouble - b.getFloat(i).toDouble)
      i += 1
    }
    s
  }

  def linf(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0; var i = 0
    while (i < n) {
      val d = Math.abs(a.getFloat(i).toDouble - b.getFloat(i).toDouble)
      if (d > s) s = d
      i += 1
    }
    s
  }

  /** Lp^p (NOT the p-th root), matching faiss METRIC_Lp
    * (extra_distances-inl.h:39-47: accumulates |x-y|^p, no root). */
  def lp(a: ArrayData, b: ArrayData, p: Double): Double = {
    val n = a.numElements()
    var s = 0.0; var i = 0
    while (i < n) {
      s += Math.pow(Math.abs(a.getFloat(i).toDouble - b.getFloat(i).toDouble), p)
      i += 1
    }
    s
  }

  /** faiss METRIC_Canberra (extra_distances-inl.h:63-72):
    * sum |x-y| / (|x| + |y|), term skipped when denominator is 0. */
  def canberra(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      val den = Math.abs(x) + Math.abs(y)
      if (den > 0.0) s += Math.abs(x - y) / den
      i += 1
    }
    s
  }

  /** faiss METRIC_BrayCurtis (extra_distances-inl.h:74-84):
    * sum|x-y| / sum|x+y|. */
  def braycurtis(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var num = 0.0; var den = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      num += Math.abs(x - y); den += Math.abs(x + y)
      i += 1
    }
    if (den > 0.0) num / den else 0.0
  }

  /** METRIC_JensenShannon (faiss extra_distances-inl.h:103-113): 0.5 *
    * sum over dims of x*log(x/m) + y*log(y/m) with m=(x+y)/2. Terms
    * with a nonpositive component are skipped — a deliberate
    * NaN-avoiding deviation (faiss would emit NaN via log of a
    * nonpositive ratio). */
  def jensenshannon(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      if (x > 0.0 && y > 0.0) {
        val m = 0.5 * (x + y)
        s += x * Math.log(x / m) + y * Math.log(y / m)
      }
      i += 1
    }
    0.5 * s
  }

  /** Float (generalized/weighted) Jaccard distance — the MyScale
    * fork's METRIC_JACCARD on the FLOAT metric enum
    * (faiss/MetricType.h:27). Generalizes the fork's binary kernel
    * (faiss/utils/binary_distances.h bvec_jaccard: popcount(a&b) /
    * popcount(a|b)) to real-valued vectors via sum-min / sum-max —
    * exactly equal to the bit kernel on 0/1 vectors. Distance =
    * (den - num) / den; den == 0 -> 1.0, mirroring bvec_jaccard's
    * accu_den == 0 case. Intended for nonnegative vectors. */
  def jaccardFloat(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var num = 0.0; var den = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      num += Math.min(x, y); den += Math.max(x, y)
      i += 1
    }
    if (den == 0.0) 1.0 else (den - num) / den
  }

  /** Float Hamming distance — the fork's METRIC_HAMMING on the FLOAT
    * metric enum (faiss/MetricType.h:28): the count of components
    * that differ, the real-valued generalization of
    * popcount(a XOR b) (faiss/utils/hamming.h). */
  def hammingFloat(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0; var i = 0
    while (i < n) {
      if (a.getFloat(i) != b.getFloat(i)) s += 1.0
      i += 1
    }
    s
  }

  def normL2(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0; var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    Math.sqrt(s)
  }

  def normL2Sqr(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0; var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    s
  }

  /** L2-normalize into a new float array (faiss fvec_renorm_L2,
    * utils/distances.h:113). Zero vectors pass through unchanged. */
  def normalize(a: ArrayData): Array[Float] = {
    val n = a.numElements()
    val out = new Array[Float](n)
    var s = 0.0; var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    val inv = if (s > 0.0) 1.0 / Math.sqrt(s) else 1.0
    i = 0
    while (i < n) { out(i) = (a.getFloat(i).toDouble * inv).toFloat; i += 1 }
    out
  }

  /** Residual x - c (faiss Index::compute_residual, Index.h:211). */
  def sub(a: ArrayData, b: ArrayData): Array[Float] = {
    val n = a.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = a.getFloat(i) - b.getFloat(i); i += 1 }
    out
  }

  def add(a: ArrayData, b: ArrayData): Array[Float] = {
    val n = a.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = a.getFloat(i) + b.getFloat(i); i += 1 }
    out
  }

  /** Hamming distance over packed binary codes
    * (faiss/utils/hamming.h:113). */
  def hamming(a: Array[Byte], b: Array[Byte]): Long = {
    var s = 0L; var i = 0
    val n = Math.min(a.length, b.length)
    while (i < n) {
      s += java.lang.Integer.bitCount((a(i) ^ b(i)) & 0xff)
      i += 1
    }
    s
  }

  /** Binary Jaccard distance 1 - |a&b|/|a|b| (faiss METRIC_JACCARD on
    * binary codes, utils/jaccard-inl.h). Returns 1.0 for two empty sets
    * intersection convention: faiss returns 0/0 -> define 1.0 distance
    * when union empty? reference treats accu_den==0 as 1.0 similarity;
    * we follow: union==0 => distance 0.0. */
  def jaccardBinary(a: Array[Byte], b: Array[Byte]): Double = {
    var inter = 0L; var union = 0L; var i = 0
    val n = Math.min(a.length, b.length)
    while (i < n) {
      inter += java.lang.Integer.bitCount(a(i) & b(i) & 0xff)
      union += java.lang.Integer.bitCount((a(i) | b(i)) & 0xff)
      i += 1
    }
    if (union == 0L) 0.0 else 1.0 - inter.toDouble / union.toDouble
  }

  /** Pack sign bits of a float vector into bytes, little-endian bit
    * order within each byte (faiss/IndexLSH.h:21 sign-bit codes;
    * bit i of byte j = sign of component 8j+i >= 0). */
  def packSignBits(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte]((n + 7) / 8)
    var i = 0
    while (i < n) {
      if (a.getFloat(i) >= 0f) out(i >> 3) = (out(i >> 3) | (1 << (i & 7))).toByte
      i += 1
    }
    out
  }

  /** Unpack a little-endian binary code into nbits 0/1 floats
    * ([[graft.core.UnpackBits]]'s kernel). */
  def unpackBits(bytes: Array[Byte], nbits: Int): ArrayData = {
    val out = new Array[Float](nbits)
    var i = 0
    while (i < nbits) {
      out(i) = ((bytes(i >> 3) >> (i & 7)) & 1).toFloat
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** b-bit little-endian slice [start, start+b) of a packed binary
    * code as a long bucket id ([[graft.core.BitSlice]] /
    * [[graft.core.BitPrefix]] kernel). */
  def bitSlice(bytes: Array[Byte], start: Int, b: Int): Long = {
    var h = 0L
    var i = 0
    while (i < b) {
      val j = start + i
      h |= (((bytes(j >> 3) >> (j & 7)) & 1).toLong) << i
      i += 1
    }
    h
  }

  /** Bench-fixture replica perturbation (Queries.replicatePairGroups):
    * v + delta where delta is a deterministic hash noise keyed on
    * (g, k), ORTHOGONALIZED against v and rescaled to the fixed
    * length 0.4*||v||, so cos(v, v+delta) = 1/sqrt(1.16) = 0.9285
    * exactly (below the 0.95 near-dup threshold, no distributional
    * tail). k = 0 returns v bit-identically (the pristine copy).
    * One O(3d) imperative pass — a lambda-expression formulation of
    * the same math gets its scalar subexpressions inlined into the
    * per-element lambdas by CollapseProject and evaluates INTERPRETED
    * at O(d^3) per row (measured: minutes per pass over 40k rows). */
  def replicaNoise(v: ArrayData, g: Long, k: Long): ArrayData = {
    val n = v.numElements()
    val out = new Array[Float](n)
    var i = 0
    if (k <= 0L) {
      while (i < n) { out(i) = v.getFloat(i); i += 1 }
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
    val u = new Array[Double](n)
    var uv = 0.0
    var vv = 0.0
    while (i < n) {
      // splitmix64-style avalanche of (g, k, i) — stable across runs
      var z = g * 0x9E3779B97F4A7C15L + k * 0xBF58476D1CE4E5B9L +
        i * 0x94D049BB133111EBL
      z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
      z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
      z ^= z >>> 33
      val r = ((z % 2001L + 2001L) % 2001L - 1000L).toDouble
      val vi = v.getFloat(i).toDouble
      u(i) = r; uv += r * vi; vv += vi * vi
      i += 1
    }
    val c = uv / math.max(vv, 1e-12)
    var pp = 0.0
    i = 0
    while (i < n) {
      val p = u(i) - c * v.getFloat(i)
      u(i) = p; pp += p * p
      i += 1
    }
    val s = 0.4 * math.sqrt(vv) / math.sqrt(math.max(pp, 1e-12))
    i = 0
    while (i < n) { out(i) = (v.getFloat(i) + s * u(i)).toFloat; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
