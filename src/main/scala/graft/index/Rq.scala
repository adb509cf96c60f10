package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim
import graft.core.{RQDecode, RQEncode, RQIpFromLut, RQLut}
import graft.functions.vec_sub

/** Residual (additive) quantizer — faiss/IndexAdditiveQuantizer.h:25 /
  * impl/ResidualQuantizer.cpp: L full-dimension k-means codebooks, each
  * trained on the residual distribution left by the previous levels
  * (ResidualQuantizer::train's level loop), with beam-search encoding
  * (refine_beam, ResidualQuantizer.cpp:651; beam width = max_beam_size,
  * ResidualQuantizer.h:55). beam = 1 is the greedy path.
  *
  * Scale shape: training is L sequential KMeans.fit calls (each fully
  * distributed, k·d floats to the driver per round) with the level-l
  * residual computed by a single codegen'd encode+decode expression
  * over the original vectors — no join, no shuffle; encode/decode are
  * plan expressions and the L·log2(k) bits/vector code column shuffles
  * like any other column. Beam width multiplies per-row encode CPU
  * (L·beam·k·d flops), never the dataflow.
  */
case class RqModel(levels: Int, k: Int, codebooks: Array[Array[Array[Float]]]) {
  /** `icmIters` > 0 refines the beam codes with LSQ-style iterated
    * conditional modes (LocalSearchQuantizer::icm_encode,
    * impl/LocalSearchQuantizer.cpp:505). */
  def encodeCol(vecCol: Column, beam: Int = 1, icmIters: Int = 0): Column =
    shim.col(RQEncode(shim.expr(vecCol), codebooks, beam, icmIters))
  def decodeCol(codesCol: Column): Column =
    shim.col(RQDecode(shim.expr(codesCol), codebooks))
  /** decode(encode(x)) in one expression. */
  def roundtripCol(vecCol: Column, beam: Int = 1, icmIters: Int = 0): Column =
    decodeCol(encodeCol(vecCol, beam, icmIters))
  /** Per-query LUT (compute_LUT): flat [levels·k] doubles. */
  def lutCol(qvecCol: Column): Column =
    shim.col(RQLut(shim.expr(qvecCol), codebooks))
  /** <q, decode(codes)> via the LUT — the ST_LUT_* scan arithmetic. */
  def ipFromLutCol(codesCol: Column, lutCol: Column): Column =
    shim.col(RQIpFromLut(shim.expr(codesCol), shim.expr(lutCol), k))
}

object Rq {

  /** Level-by-level training: level l is a k-means fit on the
    * residuals after subtracting the levels-0..l-1 reconstruction,
    * where the partial encoding uses `beam`-wide beam search and the
    * residual of the BEST beam entry trains the next level — the
    * reference's Train_top_beam variant
    * (faiss/impl/ResidualQuantizer.h:46-48); beam = 1 reproduces the
    * plain greedy trainer. */
  def train(df: DataFrame, vecCol: String, levels: Int = 2, k: Int = 16,
      niter: Int = 6, seed: Long = 1234L, beam: Int = 1): RqModel = {
    val vecs = df.select(col(vecCol).as("_v")).filter(col("_v").isNotNull)
    val cbs = new Array[Array[Array[Float]]](levels)
    for (l <- 0 until levels) {
      val res =
        if (l == 0) vecs.select(col("_v").as("_res"))
        else {
          val partial = RqModel(l, k, cbs.take(l))
          vecs.select(
            vec_sub(col("_v"), partial.roundtripCol(col("_v"), beam)).as("_res"))
        }
      cbs(l) = graft.cluster.KMeans.fit(res, "_res",
        graft.cluster.KMeans.Params(k = k, niter = niter, seed = seed + l))
        .centroids
    }
    RqModel(levels, k, cbs)
  }
}

/** Stored-norm codecs for the additive-quantizer LUT search types
  * (Search_type_t, faiss/impl/AdditiveQuantizer.h:58-67): the scan is
  * d = ||q||² − 2·<q,x̂> + ||x̂||², and these quantize the ||x̂||² term
  * stored with the codes — `ST_norm_qint8/qint4` uniformly over the
  * trained [norm_min, norm_max] range (encode_qint8/decode_qint8,
  * AdditiveQuantizer.cpp:167-186), `ST_norm_cqint8/cqint4` through a
  * 256/16-entry 1-D k-means codebook (train_norm,
  * AdditiveQuantizer.cpp:124-131 Clustering1D::train_exact — our
  * [[graft.cluster.KMeans1D]] exact DP). All arithmetic in DOUBLE
  * columns (engine convention; the oracle replays the same grid). */
object RqNorms {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** (norm_min, norm_max) trained over the stored norms
    * (AdditiveQuantizer::train_norm:113-122). */
  def range(df: DataFrame, normCol: String): (Double, Double) = {
    val r = df.agg(min(col(normCol)), max(col(normCol))).first()
    (r.getDouble(0), r.getDouble(1))
  }

  /** Fused encode+decode of the uniform qint codec: code =
    * clamp(floor((x−nmin)/(nmax−nmin)·N), 0, N−1), decode =
    * (code+0.5)/N·(nmax−nmin)+nmin. */
  def qintDecode(normCol: Column, n: Int, nmin: Double, nmax: Double): Column =
    if (nmax == nmin) lit(nmin)
    else (least(greatest(floor((normCol - nmin) / (nmax - nmin) * n),
      lit(0.0)), lit((n - 1).toDouble)) + 0.5) / n * (nmax - nmin) + nmin

  /** 1-D codebook over the stored norms (cqint<b>): exact-DP k-means,
    * k capped at the distinct-value count. */
  def cqCentroids(df: DataFrame, normCol: String, k: Int): Array[Double] = {
    val distinct = df.select(col(normCol)).distinct().count()
    graft.cluster.KMeans1D.fit(df, normCol,
      math.min(k, distinct.toInt)).centroids
  }

  /** Assign-to-nearest + decode through the cq codebook (encode_qcint
    * / decode_qcint): first index of the minimal |x−c| (ties to the
    * lower centroid index, the assign convention). */
  def cqDecode(normCol: Column, cents: Array[Double]): Column = {
    val arr = array(cents.map(lit): _*)
    val difs = transform(arr, c => abs(c - normCol))
    element_at(arr, array_position(difs, array_min(difs)).cast("int"))
  }

  /** Two-level 1-D norm codebooks (ST_norm_rq2x4 / ST_norm_lsq2x4,
    * AdditiveQuantizer.h:63-64): level 1 = exact-DP 1-D k-means over
    * the stored norms, level 2 = the same over the greedy level-1
    * residuals — the rq2x4 trainer ([[Rq4FastScanIndex.build]] uses
    * the identical recipe inline). `lsqIters > 0` then refines both
    * codebooks LSQ-style (LocalSearchQuantizer::train's alternation,
    * impl/LocalSearchQuantizer.cpp:180-230): re-encode by the EXACT
    * joint 256-pair argmin (the 1-D fixed point of icm_encode — see
    * [[graft.core.ScalarLsq2Encode]]) and update each level's entry
    * to the mean of (norm − other level's decode) over its assigned
    * rows. Trained on a bounded deterministic subsample (the
    * max_points_per_centroid convention), so the refine loop is
    * driver-side over ≤4096 doubles — never data-sized. Codebooks are
    * padded to 16 entries (duplicate entries are argmin-neutral) so
    * engine and oracle sidecars share a fixed stride. */
  def norm2Codebooks(df: DataFrame, normCol: String, seed: Long = 1234L,
      lsqIters: Int = 0): Array[Array[Double]] = {
    val sample = df.select(col(normCol).cast("double").as("_n"))
      .filter(col("_n").isNotNull)
      .withColumn("_h", xxhash64(col("_n"), lit(seed)))
      .orderBy(col("_h")).limit(4096)
      .select("_n").collect().map(_.getDouble(0))
    require(sample.nonEmpty, "no norms to train the 2x4 codec on")
    def km1d(xs: Array[Double]): Array[Double] =
      graft.cluster.KMeans1D.fitHistogram(
        xs.groupBy(identity).toArray.map { case (v, g) => (v, g.length.toLong) }
          .sortBy(_._1), 16).centroids
    def nearest(cb: Array[Double], x: Double): Int = {
      var best = 0; var bd = Double.MaxValue; var j = 0
      while (j < cb.length) {
        val d = math.abs(x - cb(j)); if (d < bd) { bd = d; best = j }; j += 1
      }
      best
    }
    val l1 = km1d(sample)
    var cb1 = l1
    var cb2 = km1d(sample.map(x => x - l1(nearest(l1, x))))
    var it = 0
    while (it < lsqIters) {
      // exact joint encode of the sample (the SAME kernel the
      // plan-side ScalarLsq2Encode runs — training assignments and
      // encode can never drift apart), then per-level conditional
      // mean update (the LSQ alternation)
      val enc = sample.map(x =>
        graft.core.Rq4FsKernels.encodeNormJoint(x, cb1, cb2))
      def update(level: Int, cb: Array[Double], other: Array[Double]): Array[Double] = {
        val next = cb.clone()
        val sums = new Array[Double](cb.length)
        val cnts = new Array[Long](cb.length)
        var i = 0
        while (i < sample.length) {
          val (a, b) = enc(i)
          val (mine, theirs) = if (level == 0) (a, b) else (b, a)
          sums(mine) += sample(i) - other(theirs)
          cnts(mine) += 1
          i += 1
        }
        var j = 0
        while (j < cb.length) {
          if (cnts(j) > 0) next(j) = sums(j) / cnts(j); j += 1
        }
        next
      }
      val n1 = update(0, cb1, cb2)
      val n2 = update(1, cb2, n1)
      cb1 = n1; cb2 = n2
      it += 1
    }
    def pad16(a: Array[Double]) =
      if (a.length >= 16) a else a ++ Array.fill(16 - a.length)(a.last)
    Array(pad16(cb1), pad16(cb2))
  }

  /** decode(codes) = cb1[j1] + cb2[j2] over a codes array column. */
  def norm2Decode(codesCol: Column, cb: Array[Array[Double]]): Column =
    element_at(array(cb(0).map(lit): _*), element_at(codesCol, 1) + 1) +
      element_at(array(cb(1).map(lit): _*), element_at(codesCol, 2) + 1)

  /** Greedy 2-level encode column (ST_norm_rq2x4's assign). */
  def rq2EncodeCol(normCol: Column, cb: Array[Array[Double]]): Column =
    shim.col(graft.core.ScalarRq2Encode(shim.expr(normCol), cb))

  /** Exact-joint 2-level encode column (ST_norm_lsq2x4's assign). */
  def lsq2EncodeCol(normCol: Column, cb: Array[Array[Double]]): Column =
    shim.col(graft.core.ScalarLsq2Encode(shim.expr(normCol), cb))
}
