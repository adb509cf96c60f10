package graft.core

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Zn-lattice spherical codec (faiss/impl/lattice_Zn.h:25-141,
  * lattice_Zn.cpp) and the IndexLattice vector codec built on it
  * (faiss/IndexLattice.h:22, IndexLattice.cpp:37-115).
  *
  * The codebook is the set of integer points of Z^dim lying on the
  * sphere of squared radius r2. Every such point is a signed
  * permutation of one of a small set of "atoms" (non-increasing
  * non-negative integer vectors with Σv² = r2), so the codec stores
  * only the atoms and ranks the (permutation, signs) pair
  * combinatorially — an enumerative code, no trained codebook at all.
  *
  * Re-derivation notes:
  *  - atom enumeration = sum_of_sq recursion (lattice_Zn.cpp:66);
  *  - nearest-point search sorts |x| descending and takes the atom
  *    with max inner product, then un-permutes and re-signs
  *    (lattice_Zn.cpp:330-369 — all sphere points have equal norm, so
  *    max dot = min L2);
  *  - permutation ranking = the multiset-combination code of
  *    Repeats::encode/decode (lattice_Zn.cpp:198-260), implemented
  *    here in the generic bool-array form (the <64-dim ctz/clz
  *    variant is a bit-level micro-optimization of the same math);
  *  - code layout per point: c0(atom) + signbits + (perm_rank <<
  *    signbits), segments ordered by atom (lattice_Zn.cpp:390-445).
  *
  * Both enumerations are implemented: the atom-ranking
  * [[ZnSphereCodec]] and the recursive-pairing [[ZnSphereCodecRec]]
  * (lattice_Zn.cpp:470+, power-of-2 dims). Their codes are
  * *incompatible* (different enumeration orders over the same point
  * set) exactly as in the reference; the Rec codec's decode_cache
  * (bottom-level memoization, lattice_Zn.h:163) is a CPU-side decode
  * speedup with no dataflow semantics — decode here walks the full
  * recursion, and the cache's capability is the enumerated codebook
  * DataFrame when bulk decode matters.
  */
object ZnLattice {

  /** Pascal's triangle: comb(n, p) for n < 64 (Long-exact). */
  private[core] val comb: Array[Array[Long]] = {
    val t = Array.ofDim[Long](64, 64)
    t(0)(0) = 1L
    var i = 1
    while (i < 64) {
      t(i)(0) = 1L
      var j = 1
      while (j <= i) { t(i)(j) = t(i - 1)(j) + t(i - 1)(j - 1); j += 1 }
      i += 1
    }
    t
  }
  @inline private[core] def C(n: Int, p: Int): Long =
    if (p > n || p < 0) 0L else comb(n)(p)

  /** All non-increasing integer vectors of length n, entries in
    * [0, v], with Σx² = total (sum_of_sq, lattice_Zn.cpp:66).
    * Returned flattened row-major, rows in the reference's order
    * (decreasing leading value). */
  private[core] def sumOfSq(total: Int, v0: Int, n: Int): Array[Int] = {
    if (total < 0) return Array.emptyIntArray
    if (n == 1) {
      var v = v0
      while (v * v > total) v -= 1
      return if (v >= 0 && v * v == total) Array(v) else Array.emptyIntArray
    }
    val res = scala.collection.mutable.ArrayBuilder.make[Int]
    var v = v0
    while (v >= 0) {
      val sub = sumOfSq(total - v * v, v, n - 1)
      var i = 0
      while (i < sub.length) {
        res += v
        var j = 0
        while (j < n - 1) { res += sub(i + j); j += 1 }
        i += n - 1
      }
      v -= 1
    }
    res.result()
  }
}

/** Enumerative codec for the integer points of Z^dim with Σx² = r2
  * (ZnSphereCodec, lattice_Zn.h:116). Serializable: ships to
  * executors inside the encode/decode expressions below. */
final class ZnSphereCodec(val dim: Int, val r2: Int) extends Serializable {
  import ZnLattice.C
  require(dim >= 1 && dim < 62, s"dim $dim out of range")

  /** Atoms: natom x dim, each non-increasing. */
  val voc: Array[Array[Int]] = {
    val flat = ZnLattice.sumOfSq(r2, math.ceil(math.sqrt(r2)).toInt + 1, dim)
    Array.tabulate(flat.length / dim)(i =>
      java.util.Arrays.copyOfRange(flat, i * dim, (i + 1) * dim))
  }
  val natom: Int = voc.length
  require(natom > 0, s"no Z^$dim points with squared norm $r2")

  /** Per-atom run-length template: values (descending) and counts. */
  private val segVals: Array[Array[Int]] = voc.map { a =>
    val b = scala.collection.mutable.ArrayBuilder.make[Int]
    var i = 0
    while (i < dim) { if (i == 0 || a(i) != a(i - 1)) b += a(i); i += 1 }
    b.result()
  }
  private val segNs: Array[Array[Int]] = voc.zip(segVals).map { case (a, vs) =>
    vs.map(v => a.count(_ == v))
  }
  /** Sign bits per atom: one per nonzero entry (lattice_Zn.cpp:396). */
  private val segSignbits: Array[Int] = voc.map(a => a.count(_ != 0))
  /** Permutation count per atom (Repeats::count, lattice_Zn.cpp:187). */
  private val segCount: Array[Long] = segNs.map { ns =>
    var accu = 1L; var remain = dim
    ns.foreach { n => accu *= C(remain, n); remain -= n }
    accu
  }
  /** First code of each atom's segment. */
  private val segC0: Array[Long] = {
    val c0 = new Array[Long](natom)
    var acc = 0L
    var i = 0
    while (i < natom) { c0(i) = acc; acc += segCount(i) << segSignbits(i); i += 1 }
    c0
  }
  /** Total number of sphere points. */
  val nv: Long = if (natom == 0) 0L else segC0(natom - 1) + (segCount(natom - 1) << segSignbits(natom - 1))
  /** Bytes needed for one code (ZnSphereCodec ctor, lattice_Zn.cpp:404). */
  val codeSize: Int = { var b = 0; var x = nv; while (x > 0) { x >>= 8; b += 1 }; b }

  /** Nearest sphere point to x (need not be normalized): sort |x|
    * descending (stable: ties by index), argmax dot over atoms,
    * un-permute and copy x's signs (lattice_Zn.cpp:330). Returns the
    * point and the atom number. */
  def search(x: Array[Float]): (Array[Int], Int) = {
    val o = Array.range(0, dim)
    // insertion sort by (|x| desc, index asc) — dim is small
    var i = 1
    while (i < dim) {
      val oi = o(i); val key = math.abs(x(oi))
      var j = i - 1
      while (j >= 0 && math.abs(x(o(j))) < key) { o(j + 1) = o(j); j -= 1 }
      o(j + 1) = oi
      i += 1
    }
    var ibest = -1
    var dpbest = -100.0
    var a = 0
    while (a < natom) {
      val atom = voc(a)
      var dp = 0.0; var k = 0
      while (k < dim) { dp += atom(k) * math.abs(x(o(k)).toDouble); k += 1 }
      if (dp > dpbest) { dpbest = dp; ibest = a }
      a += 1
    }
    val c = new Array[Int](dim)
    val atom = voc(ibest)
    i = 0
    while (i < dim) {
      c(o(i)) = if (x(o(i)) < 0) -atom(i) else atom(i)
      i += 1
    }
    (c, ibest)
  }

  /** Rank the permutation of |c| against atom `ano`'s run-length
    * template (Repeats::encode, lattice_Zn.cpp:198 generic form). */
  private def permEncode(ano: Int, cabs: Array[Int]): Long = {
    val vs = segVals(ano); val ns = segNs(ano)
    val coded = new Array[Boolean](dim)
    var nfree = dim
    var code = 0L; var shift = 1L
    var ri = 0
    while (ri < vs.length) {
      val v = vs(ri); val n = ns(ri)
      var rank = 0; var occ = 0
      var codeComb = 0L
      var i = 0
      var done = false
      while (i < dim && !done) {
        if (!coded(i)) {
          if (cabs(i) == v) {
            codeComb += C(rank, occ + 1)
            occ += 1
            coded(i) = true
            if (occ == n) done = true
          }
          rank += 1
        }
        i += 1
      }
      code += shift * codeComb
      shift *= C(nfree, n)
      nfree -= n
      ri += 1
    }
    code
  }

  /** decode_comb_1 (lattice_Zn.cpp:95). Returns (rank, remaining n). */
  private def decodeComb1(n0: Long, k1: Int, r0: Int): (Int, Long) = {
    var r = r0; var n = n0
    while (C(r, k1) > n) r -= 1
    n -= C(r, k1)
    (r, n)
  }

  /** Un-rank a permutation code into |c| values (Repeats::decode,
    * lattice_Zn.cpp:228 generic form). */
  private def permDecode(ano: Int, code0: Long, c: Array[Int]): Unit = {
    val vs = segVals(ano); val ns = segNs(ano)
    val decoded = new Array[Boolean](dim)
    var nfree = dim
    var code = code0
    var ri = 0
    while (ri < vs.length) {
      val v = vs(ri); val n = ns(ri)
      val maxComb = C(nfree, n)
      var codeComb = code % maxComb
      code /= maxComb
      var occ = 0
      var rank = nfree
      var nr = decodeComb1(codeComb, n, rank)
      var nextRank = nr._1; codeComb = nr._2
      var i = dim - 1
      var done = false
      while (i >= 0 && !done) {
        if (!decoded(i)) {
          rank -= 1
          if (rank == nextRank) {
            decoded(i) = true
            c(i) = v
            occ += 1
            if (occ == n) done = true
            else {
              nr = decodeComb1(codeComb, n - occ, nextRank)
              nextRank = nr._1; codeComb = nr._2
            }
          }
        }
        i -= 1
      }
      nfree -= n
      ri += 1
    }
  }

  /** search + enumerative encode (search_and_encode,
    * lattice_Zn.cpp:410): code = c0(atom) + signs + perm << signbits. */
  def encode(x: Array[Float]): Long = {
    val (c, ano) = search(x)
    var signs = 0L
    val cabs = new Array[Int](dim)
    var nnz = 0
    var i = 0
    while (i < dim) {
      cabs(i) = math.abs(c(i))
      if (c(i) != 0) {
        if (c(i) < 0) signs |= 1L << nnz
        nnz += 1
      }
      i += 1
    }
    segC0(ano) + signs + (permEncode(ano, cabs) << segSignbits(ano))
  }

  /** Decode a code to its integer sphere point (lattice_Zn.cpp:440). */
  def decode(code0: Long): Array[Int] = {
    // binary search the atom segment
    var i0 = 0; var i1 = natom
    while (i0 + 1 < i1) {
      val imed = (i0 + i1) >>> 1
      if (segC0(imed) <= code0) i0 = imed else i1 = imed
    }
    var code = code0 - segC0(i0)
    val signs = code
    code >>= segSignbits(i0)
    val c = new Array[Int](dim)
    permDecode(i0, code, c)
    var nnz = 0
    var i = 0
    while (i < dim) {
      if (c(i) != 0) {
        if ((signs & (1L << nnz)) != 0) c(i) = -c(i)
        nnz += 1
      }
      i += 1
    }
    c
  }
}

/** ZnSphereCodecRec (faiss/impl/lattice_Zn.h:143, lattice_Zn.cpp:470+):
  * the recursive enumerative codec over the SAME sphere point set, for
  * power-of-2 dims. Instead of ranking (atom, permutation, signs), it
  * counts points by a pairing DP — nv(ld, r2a) = points of squared
  * norm r2a in dim 2^ld — and ranks each point by a mixed-radix code
  * over its recursive halves:
  *
  *   code(pair) = nvCum(ld, r2a+r2b, r2a) + code_a * nv(ld-1, r2b) + code_b
  *
  * Codes are deliberately INCOMPATIBLE with [[ZnSphereCodec]]'s (the
  * reference keeps both; ZnSphereCodecAlt picks Rec when dim is a
  * power of 2). `encodeCentroid` requires an exact lattice point
  * (integer coordinates with sum of squares = r2), like the
  * reference's "vectors need to be centroids" contract; arbitrary-
  * vector encode = [[ZnSphereCodec.search]] then [[encodeCentroid]]
  * (ZnSphereCodecAlt::encode, lattice_Zn.cpp:560). The reference's
  * decode_cache bottoms the recursion at dim 8 with a memo table — a
  * CPU-speedup with no dataflow semantics — so decode here walks the
  * recursion to the leaves. */
final class ZnSphereCodecRec(val dim: Int, val r2: Int) extends Serializable {
  val log2Dim: Int = { var l = 0; while (dim > (1 << l)) l += 1; l }
  require(dim == (1 << log2Dim), s"ZnSphereCodecRec needs a power-of-2 dim, got $dim")

  /** allNv(ld)(r2a): number of sphere points in dim 2^ld, norm² r2a. */
  private val allNv = Array.ofDim[Long](log2Dim + 1, r2 + 1)
  /** allNvCum(ld)(r2t)(r2a): rank offset of the r2a-split within the
    * norm²-r2t points of dim 2^ld (lattice_Zn.cpp set_nv_cum). */
  private val allNvCum = Array.ofDim[Long](log2Dim + 1, r2 + 1, r2 + 1)
  locally {
    var r2a = 0
    while (r2a <= r2) {
      val r = math.sqrt(r2a.toDouble).toInt
      allNv(0)(r2a) = if (r * r == r2a) (if (r == 0) 1L else 2L) else 0L
      r2a += 1
    }
    var ld = 1
    while (ld <= log2Dim) {
      var r2sub = 0
      while (r2sub <= r2) {
        var nvAcc = 0L
        var a = 0
        while (a <= r2sub) {
          allNvCum(ld)(r2sub)(a) = nvAcc
          nvAcc += allNv(ld - 1)(a) * allNv(ld - 1)(r2sub - a)
          a += 1
        }
        allNv(ld)(r2sub) = nvAcc
        r2sub += 1
      }
      ld += 1
    }
  }
  /** Total sphere points — must agree with [[ZnSphereCodec.nv]] (the
    * two codecs enumerate the same set; ZnLatticeSpec asserts it). */
  val nv: Long = allNv(log2Dim)(r2)
  val codeSize: Int = { var b = 0; var x = nv; while (x > 0) { x >>= 8; b += 1 }; b }

  /** Rank of an exact lattice point (encode_centroid, lattice_Zn.cpp). */
  def encodeCentroid(c: Array[Int]): Long = {
    require(c.length == dim, s"point has ${c.length} dims, codec $dim")
    val codes = new Array[Long](dim)
    val norm2s = new Array[Int](dim)
    var i = 0
    while (i < dim) {
      if (c(i) == 0) { codes(i) = 0L; norm2s(i) = 0 }
      else {
        norm2s(i) = c(i) * c(i)
        codes(i) = if (c(i) >= 0) 0L else 1L
      }
      i += 1
    }
    var dim2 = dim / 2
    var ld = 1
    while (ld <= log2Dim) {
      var j = 0
      while (j < dim2) {
        val r2a = norm2s(2 * j); val r2b = norm2s(2 * j + 1)
        codes(j) = allNvCum(ld)(r2a + r2b)(r2a) +
          codes(2 * j) * allNv(ld - 1)(r2b) + codes(2 * j + 1)
        norm2s(j) = r2a + r2b
        j += 1
      }
      dim2 /= 2
      ld += 1
    }
    codes(0)
  }

  /** Inverse rank: binary-search the half-norm split per level, then
    * divmod into the two halves (decode, lattice_Zn.cpp — the
    * decode_cache_ld = 0 leaf form). */
  def decode(code: Long): Array[Int] = {
    val codes = new Array[Long](dim)
    val norm2s = new Array[Int](dim)
    codes(0) = code
    norm2s(0) = r2
    var dim2 = 1
    var ld = log2Dim
    while (ld > 0) {
      var i = dim2 - 1
      while (i >= 0) {
        val r2sub = norm2s(i)
        var i0 = 0; var i1 = r2sub + 1
        var codei = codes(i)
        val cum = allNvCum(ld)(r2sub)
        while (i1 > i0 + 1) {
          val imed = (i0 + i1) / 2
          if (cum(imed) <= codei) i0 = imed else i1 = imed
        }
        val r2a = i0; val r2b = r2sub - i0
        codei -= cum(r2a)
        norm2s(2 * i) = r2a
        norm2s(2 * i + 1) = r2b
        val nvb = allNv(ld - 1)(r2b)
        codes(2 * i) = codei / nvb
        codes(2 * i + 1) = codei % nvb
        i -= 1
      }
      dim2 *= 2
      ld -= 1
    }
    val out = new Array[Int](dim)
    var i = 0
    while (i < dim) {
      if (norm2s(i) == 0) out(i) = 0
      else {
        val r = math.sqrt(norm2s(i).toDouble).toInt
        out(i) = if (codes(i) == 0) r else -r
      }
      i += 1
    }
    out
  }
}

/** Rank a lattice point (array<int>) with the RECURSIVE codec. */
case class ZnRecEncode(child: Expression, codec: ZnSphereCodecRec)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "zn_rec_encode"
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    codec.encodeCentroid(Array.tabulate(codec.dim)(i => a.getInt(i)))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Inverse rank: code (long) back to the lattice point (array<int>). */
case class ZnRecDecode(child: Expression, codec: ZnSphereCodecRec)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "zn_rec_decode"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(codec.decode(v.asInstanceOf[Long]))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** IndexLattice analog (faiss/IndexLattice.h:22): d split into nsq
  * subvectors; each stored as (scaleNbit-bit quantized norm,
  * lattice code of the direction), bit-packed LSB-first. `mins`/
  * `maxs` are the trained per-subvector norm ranges
  * (IndexLattice::train, IndexLattice.cpp:37). */
final class LatticeCodec(val d: Int, val nsq: Int, val scaleNbit: Int, val r2: Int,
    val mins: Array[Float], val maxs: Array[Float]) extends Serializable {
  require(d % nsq == 0, s"d=$d not divisible by nsq=$nsq")
  val dsq: Int = d / nsq
  val zn = new ZnSphereCodec(dsq, r2)
  /** Bits for one lattice code (IndexLattice.cpp:25-28). */
  val latticeNbit: Int = { var b = 0; while ((1L << b) < zn.nv) b += 1; b }
  /** Packed bytes per vector (IndexLattice.cpp:30-32). */
  val codeSize: Int = (nsq * (latticeNbit + scaleNbit) + 7) / 8

  private def writeBits(bytes: Array[Byte], pos0: Int, v: Long, nbit: Int): Int = {
    var pos = pos0; var i = 0
    while (i < nbit) {
      if (((v >>> i) & 1L) != 0) bytes(pos >> 3) = (bytes(pos >> 3) | (1 << (pos & 7))).toByte
      pos += 1; i += 1
    }
    pos
  }
  private def readBits(bytes: Array[Byte], pos0: Int, nbit: Int): Long = {
    var v = 0L; var pos = pos0; var i = 0
    while (i < nbit) {
      if ((bytes(pos >> 3) & (1 << (pos & 7))) != 0) v |= 1L << i
      pos += 1; i += 1
    }
    v
  }

  /** Unpacked per-subvector codes: [scale_0, lattice_0, scale_1, ...]
    * (the sa_encode loop body, IndexLattice.cpp:76-89, float
    * arithmetic as the reference). */
  def subCodes(x: Array[Float]): Array[Long] = {
    val sc = 1L << scaleNbit
    val out = new Array[Long](2 * nsq)
    var j = 0
    while (j < nsq) {
      var norm2 = 0.0f
      var l = 0
      while (l < dsq) { val v = x(j * dsq + l); norm2 += v * v; l += 1 }
      val span = maxs(j) - mins(j)
      var nj = if (span > 0) (math.sqrt(norm2).toFloat - mins(j)) * sc / span else 0.0f
      if (nj < 0) nj = 0
      if (nj >= sc) nj = sc - 1
      val sub = new Array[Float](dsq)
      l = 0
      while (l < dsq) { sub(l) = x(j * dsq + l); l += 1 }
      out(2 * j) = nj.toLong
      out(2 * j + 1) = zn.encode(sub)
      j += 1
    }
    out
  }

  def encode(x: Array[Float]): Array[Byte] = {
    val codes = subCodes(x)
    val bytes = new Array[Byte](codeSize)
    var pos = 0
    var j = 0
    while (j < nsq) {
      pos = writeBits(bytes, pos, codes(2 * j), scaleNbit)
      pos = writeBits(bytes, pos, codes(2 * j + 1), latticeNbit)
      j += 1
    }
    bytes
  }

  /** Reconstruct one subvector from its unpacked codes (the sa_decode
    * loop body, IndexLattice.cpp:103-112, float arithmetic). */
  def decodeSub(j: Int, scaleCode: Long, latCode: Long): Array[Float] = {
    val sc = (1L << scaleNbit).toFloat
    val r = math.sqrt(zn.r2.toDouble).toFloat
    val norm = ((scaleCode + 0.5f) * (maxs(j) - mins(j)) / sc + mins(j)) / r
    val c = zn.decode(latCode)
    val out = new Array[Float](dsq)
    var l = 0
    while (l < dsq) { out(l) = c(l) * norm; l += 1 }
    out
  }

  def decode(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](d)
    var pos = 0
    var j = 0
    while (j < nsq) {
      val scaleCode = readBits(bytes, pos, scaleNbit); pos += scaleNbit
      val latCode = readBits(bytes, pos, latticeNbit); pos += latticeNbit
      val sub = decodeSub(j, scaleCode, latCode)
      System.arraycopy(sub, 0, out, j * dsq, dsq)
      j += 1
    }
    out
  }
}

/** Packed ZnLattice encode: array<float> → binary (sa_encode,
  * IndexLattice.cpp:70). */
case class ZnLatticeEncode(child: Expression, codec: LatticeCodec)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "zn_lattice_encode"
  override def nullSafeEval(v: Any): Any =
    codec.encode(v.asInstanceOf[ArrayData].toFloatArray())
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Packed ZnLattice decode: binary → array<float> (sa_decode,
  * IndexLattice.cpp:93). */
case class ZnLatticeDecode(child: Expression, codec: LatticeCodec)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "zn_lattice_decode"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(codec.decode(v.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Unpacked per-subvector codes [scale_0, lat_0, scale_1, lat_1, ...]
  * — the oracle-friendly integer view of the same encoding. */
case class ZnLatticeSubCodes(child: Expression, codec: LatticeCodec)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "zn_lattice_sub_codes"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(codec.subCodes(v.asInstanceOf[ArrayData].toFloatArray()))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
