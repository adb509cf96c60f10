package graft.core

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Residual-quantizer kernels (faiss/impl/ResidualQuantizer.h:22-60,
  * IndexAdditiveQuantizer.h:25): L full-dimension codebooks — level l
  * encodes the residual left by levels 0..l-1, and decode is the sum
  * of the selected codewords. [[RqKernels.encode]] is the beam_size=1
  * greedy path; [[RqKernels.encodeBeam]] is the reference's
  * beam-search encoder (ResidualQuantizer::refine_beam,
  * impl/ResidualQuantizer.cpp:651 / beam_search_encode_step :129,
  * beam width = max_beam_size, ResidualQuantizer.h:55): keep the
  * `beam` best partial codes by cumulative reconstruction error at
  * every level, return the best full path. Subspace PQ is the special
  * case where codewords are nonzero on disjoint slices. codebooks
  * layout: [L][k][d]. */
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

  /** Beam-search encoding (beam >= 1). At each level every surviving
    * partial code is extended with all k codewords; the `beam` best
    * extensions by cumulative squared reconstruction error survive
    * (ties broken on lower codeword index then earlier parent —
    * deterministic). Residuals are kept in float32 between levels like
    * the greedy path; distances accumulate in double. The greedy path
    * always survives level 0, so beam search can only match or beat
    * greedy per level-0 choice, and in aggregate strictly beats it on
    * real data (RqSpec asserts this). */
  def encodeBeam(a: ArrayData, cb: Array[Array[Array[Float]]], beam: Int): Array[Int] = {
    if (beam <= 1) return encode(a, cb)
    beamFinal(a, cb, beam)._1(0) // selection kept best-first
  }

  /** The FULL final beam of the beam-search encode: (codes, dists)
    * best-first, dists = complete-path squared reconstruction errors.
    * This is the coarse search of ResidualCoarseQuantizer
    * (faiss/IndexAdditiveQuantizer.h:193, ResidualCoarseQuantizer::
    * search refine_beam path): the surviving beam entries ARE the
    * candidate coarse cells. With beam = k^L every path survives, so
    * the beam degenerates to the exact argmin over all enumerated
    * codeword sums. */
  def beamFinal(a: ArrayData, cb: Array[Array[Array[Float]]],
      beam: Int): (Array[Array[Int]], Array[Double]) = {
    val L = cb.length
    val d = cb(0)(0).length
    val k = cb(0).length
    // current beam: codes[b][l], residual[b][d], dist[b]
    var nBeam = 1
    var codes = Array.ofDim[Int](1, 0)
    var res = Array(Array.tabulate(d)(a.getFloat))
    var dists = Array(0.0)
    var l = 0
    while (l < L) {
      val nCand = nBeam * k
      val candDist = new Array[Double](nCand)
      var b = 0
      while (b < nBeam) {
        val r = res(b)
        var j = 0
        while (j < k) {
          val c = cb(l)(j)
          var s = 0.0; var t = 0
          while (t < d) { val dv = r(t).toDouble - c(t); s += dv * dv; t += 1 }
          candDist(b * k + j) = s
          j += 1
        }
        b += 1
      }
      // select the `keep` smallest candidates; stable insertion keeps
      // the (lower j, earlier parent) tie order since candidates are
      // generated in that order
      val keep = Math.min(beam, nCand)
      val sel = new Array[Int](keep)
      val selDist = new Array[Double](keep)
      var nSel = 0
      var ci = 0
      while (ci < nCand) {
        if (nSel < keep || candDist(ci) < selDist(nSel - 1)) {
          var pos = if (nSel < keep) nSel else keep - 1
          while (pos > 0 && candDist(ci) < selDist(pos - 1)) {
            selDist(pos) = selDist(pos - 1); sel(pos) = sel(pos - 1); pos -= 1
          }
          selDist(pos) = candDist(ci); sel(pos) = ci
          if (nSel < keep) nSel += 1
        }
        ci += 1
      }
      val nextCodes = Array.ofDim[Int](keep, l + 1)
      val nextRes = Array.ofDim[Float](keep, d)
      var s2 = 0
      while (s2 < keep) {
        val parent = sel(s2) / k; val j = sel(s2) % k
        System.arraycopy(codes(parent), 0, nextCodes(s2), 0, l)
        nextCodes(s2)(l) = j
        val r = res(parent); val c = cb(l)(j)
        var t = 0
        while (t < d) { nextRes(s2)(t) = r(t) - c(t); t += 1 }
        s2 += 1
      }
      codes = nextCodes; res = nextRes; nBeam = keep
      dists = java.util.Arrays.copyOf(selDist, keep)
      l += 1
    }
    (codes, dists)
  }

  /** Top-nprobe coarse lists from the final beam, radix-packed:
    * list_no = Σ_l code_l · k^(L-1-l) — the virtual-centroid id of
    * ResidualCoarseQuantizer (nlist = k^L centroids that are never
    * materialized; assignment costs L·beam·k·d instead of nlist·d).
    * Rows are InternalRow(list_no: int, dist: double), best-first. */
  def rcqTopLists(a: ArrayData, cb: Array[Array[Array[Float]]],
      beam: Int, nprobe: Int): ArrayData = {
    val (codes, dists) = beamFinal(a, cb, math.max(beam, nprobe))
    val k = cb(0).length
    // re-sort the final beam by (dist, packed list_no) before the
    // nprobe truncation: beamFinal's insertion order ties by beam
    // GENERATION order (parent rank, then j), but the probe compare
    // downstream (and the ivf_rcq_search oracle) ties by list_no — an
    // exact double-distance tie across distinct cells (duplicate or
    // symmetric vectors) would otherwise order probes differently
    // (ADVICE r9)
    val packed = Array.tabulate(codes.length) { i =>
      var listNo = 0
      var l = 0
      while (l < codes(i).length) { listNo = listNo * k + codes(i)(l); l += 1 }
      listNo
    }
    val order = Array.tabulate(codes.length)(identity).sortWith { (x, y) =>
      dists(x) < dists(y) || (dists(x) == dists(y) && packed(x) < packed(y))
    }
    val n = math.min(nprobe, codes.length)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val src = order(i)
      out(i) = org.apache.spark.sql.catalyst.InternalRow(packed(src), dists(src))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** ICM (iterated-conditional-modes) refinement — the encoding loop
    * of faiss's LocalSearchQuantizer (impl/LocalSearchQuantizer.cpp:505
    * icm_encode / :543 icm_encode_step): starting from the beam-search
    * codes, cyclically re-optimize one level's code conditioned on all
    * the others (argmin_j ||x - sum_{l' != l} c_l' - c_j||^2) until a
    * full sweep changes nothing or `iters` sweeps ran. Every accepted
    * move strictly lowers reconstruction error, so the result is never
    * worse than the beam seed. (The reference adds random perturbation
    * rounds — ILS — on top; this is the deterministic descent core.) */
  def encodeIcm(a: ArrayData, cb: Array[Array[Array[Float]]],
      beam: Int, iters: Int): Array[Int] = {
    val codes = encodeBeam(a, cb, beam)
    if (iters <= 0) return codes
    val L = cb.length
    val d = cb(0)(0).length
    // running reconstruction sum (double — scoring precision)
    val rec = new Array[Double](d)
    var l = 0
    while (l < L) {
      val c = cb(l)(codes(l))
      var t = 0
      while (t < d) { rec(t) += c(t); t += 1 }
      l += 1
    }
    var sweep = 0
    var changed = true
    while (changed && sweep < iters) {
      changed = false
      l = 0
      while (l < L) {
        val cOld = cb(l)(codes(l))
        var best = codes(l); var bestD = Double.MaxValue
        var j = 0
        while (j < cb(l).length) {
          val cj = cb(l)(j)
          var s = 0.0; var t = 0
          while (t < d) {
            val dv = a.getFloat(t) - (rec(t) - cOld(t)) - cj(t)
            s += dv * dv
            t += 1
          }
          if (s < bestD) { bestD = s; best = j }
          j += 1
        }
        if (best != codes(l)) {
          val cNew = cb(l)(best)
          var t = 0
          while (t < d) { rec(t) += cNew(t).toDouble - cOld(t); t += 1 }
          codes(l) = best
          changed = true
        }
        l += 1
      }
      sweep += 1
    }
    codes
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

case class RQEncode(child: Expression, codebooks: Array[Array[Array[Float]]],
    beam: Int = 1, icmIters: Int = 0)
    extends UnaryExpression with CodegenFallback {
  require(beam >= 1, "beam must be >= 1")
  require(icmIters >= 0, "icmIters must be >= 0")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String =
    if (beam == 1 && icmIters == 0) "rq_encode"
    else s"rq_encode_beam${beam}_icm$icmIters"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      if (icmIters == 0) RqKernels.encodeBeam(v.asInstanceOf[ArrayData], codebooks, beam)
      else RqKernels.encodeIcm(v.asInstanceOf[ArrayData], codebooks, beam, icmIters))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Top-nprobe coarse lists of a ResidualCoarseQuantizer
  * (faiss/IndexAdditiveQuantizer.h:193; ResidualCoarseQuantizer::
  * search): the `beam`-wide beam search over the RQ codebooks, with
  * the surviving complete paths radix-packed into virtual-centroid
  * ids. Returns array<struct<list_no:int, dist:double>> best-first —
  * the [[NearestCentroids]] contract, at L·beam·k·d cost instead of
  * nlist·d. beam >= k^L degenerates to the exact argmin. */
case class RcqTopLists(child: Expression, codebooks: Array[Array[Array[Float]]],
    beam: Int, nprobe: Int)
    extends UnaryExpression with CodegenFallback {
  require(beam >= 1 && nprobe >= 1, "beam and nprobe must be >= 1")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("list_no", IntegerType, nullable = false),
    StructField("dist", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = s"rcq_top_lists_b${beam}_n$nprobe"
  override def nullSafeEval(v: Any): Any =
    RqKernels.rcqTopLists(v.asInstanceOf[ArrayData], codebooks, beam, nprobe)
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

/** Per-query additive-quantizer LUT: flat [L·k] array of
  * LUT[l·k + j] = <q, cb[l][j]> (compute_LUT,
  * faiss/impl/AdditiveQuantizer.cpp — the basis of every ST_LUT_*
  * search type). Computed once per query row, joined against the
  * codes: the scan then costs L lookups+adds per candidate instead of
  * a d-dim decode+distance. */
case class RQLut(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "rq_lut"
  override def nullSafeEval(v: Any): Any = {
    val q = v.asInstanceOf[ArrayData]
    val levels = codebooks.length
    val k = codebooks(0).length
    val d = codebooks(0)(0).length
    val out = new Array[Double](levels * k)
    var l = 0
    while (l < levels) {
      var j = 0
      while (j < k) {
        val c = codebooks(l)(j)
        var s = 0.0; var i = 0
        while (i < d) { s += q.getFloat(i).toDouble * c(i); i += 1 }
        out(l * k + j) = s
        j += 1
      }
      l += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** <q, decode(codes)> from a precomputed LUT: the tight scan loop of
  * ST_LUT_nonorm / ST_norm_float search
  * (faiss/impl/AdditiveQuantizer.h:58-67; exact because the decoded
  * vector is the SUM of per-level codewords, so its inner product
  * distributes over the LUT entries). */
case class RQIpFromLut(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "rq_ip_from_lut"
  override def nullSafeEval(codes: Any, lut: Any): Any = {
    val cd = codes.asInstanceOf[ArrayData]
    val lu = lut.asInstanceOf[ArrayData]
    var s = 0.0
    var l = 0
    val levels = cd.numElements()
    while (l < levels) { s += lu.getDouble(l * k + cd.getInt(l)); l += 1 }
    s
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Additive-quantizer fast-scan support
  * (faiss/IndexAdditiveQuantizerFastScan.h:30, search type
  * ST_norm_rq2x4 — impl/AdditiveQuantizer.cpp:132-158): the L2
  * distance qnorm − 2·<q,dec> + ||dec||² is evaluated entirely from a
  * quantized LUT of M = L + 2 four-bit columns: L columns of
  * −2·<q, cb[l][j]> plus TWO norm columns holding the scalar
  * codebooks of a 1-D two-level residual quantizer trained on the
  * reconstruction norms. One uint8 quantization pass
  * ([[Pq4Kernels.quantLut]]) covers all columns, so the scan is the
  * same nibble-packed integer accumulate as PQ fast-scan
  * ([[Pq4AdcQ]]); norm_scale is fixed at 1 (the reference's default
  * before estimate_norm_scale sees pathological spans). */
object Rq4FsKernels {
  /** Greedy 2-level scalar RQ encode of one norm value against the
    * norm codebooks (ResidualQuantizer(1, 2, 4) assignment). */
  def encodeNorm(v: Double, normCb: Array[Array[Double]]): Array[Int] = {
    val out = new Array[Int](normCb.length)
    var resid = v
    var l = 0
    while (l < normCb.length) {
      val cb = normCb(l)
      var best = 0; var bestD = Double.MaxValue
      var j = 0
      while (j < cb.length) {
        val d = math.abs(resid - cb(j))
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(l) = best
      resid -= cb(best)
      l += 1
    }
    out
  }

  /** Exact JOINT 2-level argmin over all (j1, j2) pairs — the
    * ST_norm_lsq2x4 assignment (the 1-D fixed point of
    * LocalSearchQuantizer::icm_encode; ties to the lexicographically
    * smallest pair). ONE definition shared by the plan-side
    * [[ScalarLsq2Encode]] and the driver-side LSQ codebook refinement
    * ([[graft.index.RqNorms.norm2Codebooks]]) so training assignments
    * and encode can never drift apart. */
  def encodeNormJoint(x: Double, cb1: Array[Double],
      cb2: Array[Double]): (Int, Int) = {
    var best1 = 0; var best2 = 0; var bestD = Double.MaxValue
    var j1 = 0
    while (j1 < cb1.length) {
      val r = x - cb1(j1)
      var j2 = 0
      while (j2 < cb2.length) {
        val d = math.abs(r - cb2(j2))
        if (d < bestD) { bestD = d; best1 = j1; best2 = j2 }
        j2 += 1
      }
      j1 += 1
    }
    (best1, best2)
  }
}

/** array<int> codes (AQ levels then norm levels) → nibble-packed
  * binary, the AQ-side twin of [[Pq4PackCodes]]. */
case class Rq4PackCodes(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "rq4_pack"
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val bytes = new Array[Byte](a.numElements())
    var i = 0
    while (i < bytes.length) { bytes(i) = a.getInt(i).toByte; i += 1 }
    Pq4Kernels.pack(bytes)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** norm value (double) → 2 greedy scalar-RQ code nibbles. */
case class ScalarRq2Encode(child: Expression, normCb: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "scalar_rq2_encode"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(Rq4FsKernels.encodeNorm(v.asInstanceOf[Double], normCb))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** norm value (double) → 2 LSQ scalar code nibbles (ST_norm_lsq2x4,
  * faiss/impl/AdditiveQuantizer.h:64): the code pair minimizing
  * |v − c1[j1] − c2[j2]| JOINTLY. The reference reaches this with
  * iterated conditional modes (LocalSearchQuantizer::icm_encode); in
  * 1-D the 256-pair argmin is exact, deterministic, and is the fixed
  * point ICM converges to — a deliberate algorithmic substitution.
  * Ties break to the lexicographically smallest (j1, j2), the
  * first-found convention of every assign kernel here. */
case class ScalarLsq2Encode(child: Expression, normCb: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "scalar_lsq2_encode"
  override def nullSafeEval(v: Any): Any = {
    val (j1, j2) = Rq4FsKernels.encodeNormJoint(v.asInstanceOf[Double],
      normCb(0), normCb(1))
    new GenericArrayData(Array(j1, j2))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-query quantized fast-scan LUT over (L AQ columns + 2 norm
  * columns); struct(lutq, a, b) exactly like [[Pq4QuantLut]].
  * `normScale > 1` divides the norm columns before the shared uint8
  * quantization (compute_float_LUT's rescale,
  * faiss/IndexAdditiveQuantizerFastScan.cpp:170-173) so a dominant
  * norm span stops crushing the IP columns' resolution; the scan then
  * multiplies the norm lookups back ([[Pq4AdcQScaled]]). */
case class Rq4FsQuantLut(child: Expression,
    codebooks: Array[Array[Array[Float]]], normCb: Array[Array[Double]],
    normScale: Int = 1)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("lutq", BinaryType, nullable = false),
    StructField("a", DoubleType, nullable = false),
    StructField("b", DoubleType, nullable = false)))
  override def prettyName: String = "rq4fs_quant_lut"
  override def nullSafeEval(v: Any): Any = {
    val q = v.asInstanceOf[ArrayData]
    val levels = codebooks.length
    val k = codebooks(0).length
    val d = codebooks(0)(0).length
    val m2 = levels + normCb.length
    val lut = new Array[Double](m2 * k)
    var l = 0
    while (l < levels) {
      var j = 0
      while (j < k) {
        val c = codebooks(l)(j)
        var s = 0.0; var i = 0
        while (i < d) { s += q.getFloat(i).toDouble * c(i); i += 1 }
        lut(l * k + j) = -2.0 * s
        j += 1
      }
      l += 1
    }
    var p = 0
    while (p < normCb.length) {
      var j = 0
      while (j < normCb(p).length) {
        lut((levels + p) * k + j) = normCb(p)(j) / normScale
        j += 1
      }
      p += 1
    }
    val (lutq, a, b) = Pq4Kernels.quantLut(lut, m2, k)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](lutq, a, b))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
