package graft.core

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Driver-side product quantizer over an index's CENTROID table — the
  * quantizer-as-sub-index of the reference's parenthesized coarse
  * grammar (`IVF<n>(PQ<m>[x<k>])`, index_factory.cpp:263-267,719:
  * any sub-description inside the parentheses becomes the IndexIVF's
  * coarse quantizer; an IndexPQ quantizer ranks cells by ADC instead
  * of the exact centroid argmin).
  *
  * The table being quantized is the nlist-row centroid set — driver
  * memory by construction (it is already held as `Array[Array[Float]]`
  * on every IVF index) — so training runs locally: per-subspace Lloyd
  * k-means, deterministic under `seed` so every caller (factory
  * build, search probe selection, the Verify sidecar dump) derives
  * the identical model from the same centroids. */
object CoarsePq {

  /** (codebooks(m)(j) = float[dsub], codes(i) = byte[m]) */
  type Model = (Array[Array[Array[Float]]], Array[Array[Byte]])

  /** Identity-keyed memo: the same centroid array (one per live IVF
    * index) never retrains; entries die with the index (weak keys —
    * arrays hash by reference). */
  private val cache =
    new java.util.WeakHashMap[Array[Array[Float]], Map[(Int, Int, Int, Long), Model]]()

  def model(centroids: Array[Array[Float]], m: Int, ksub: Int,
      niter: Int = 10, seed: Long = 1234L): Model = cache.synchronized {
    val k = (m, ksub, niter, seed)
    val inner = Option(cache.get(centroids)).getOrElse(Map.empty)
    inner.get(k) match {
      case Some(mod) => mod
      case None =>
        val mod = trainEncode(centroids, m, ksub, niter, seed)
        cache.put(centroids, inner + (k -> mod))
        mod
    }
  }

  /** Per-subspace Lloyd k-means + encode, all in driver memory. */
  def trainEncode(vecs: Array[Array[Float]], m: Int, ksub: Int,
      niter: Int, seed: Long): Model = {
    val n = vecs.length
    require(n > 0, "empty centroid table")
    val d = vecs(0).length
    require(d % m == 0, s"d=$d not divisible by m=$m")
    require(ksub <= n, s"ksub=$ksub > ${n} centroids to train on")
    require(ksub <= 256, s"coarse-PQ ksub=$ksub > 256 (byte code)")
    val dsub = d / m
    val rng = new java.util.Random(seed)
    val codebooks = Array.ofDim[Array[Array[Float]]](m)
    val codes = Array.fill(n)(new Array[Byte](m))
    var mi = 0
    while (mi < m) {
      val off = mi * dsub
      // seeded-shuffle init over the subvectors (distinct rows)
      val order = Array.range(0, n)
      var i = n - 1
      while (i > 0) {
        val j = rng.nextInt(i + 1)
        val t = order(i); order(i) = order(j); order(j) = t
        i -= 1
      }
      val cb = Array.tabulate(ksub) { j =>
        java.util.Arrays.copyOfRange(vecs(order(j)), off, off + dsub)
      }
      val assign = new Array[Int](n)
      var it = 0
      while (it < niter) {
        // assign (argmin, ties to the lower j — faiss convention)
        var r = 0
        while (r < n) {
          var best = 0; var bestD = Double.MaxValue
          var j = 0
          while (j < ksub) {
            var s = 0.0; var t = 0
            val c = cb(j)
            while (t < dsub) {
              val dd = vecs(r)(off + t).toDouble - c(t); s += dd * dd; t += 1
            }
            if (s < bestD) { bestD = s; best = j }
            j += 1
          }
          assign(r) = best
          r += 1
        }
        // update; empty clusters keep their previous center
        val sums = Array.ofDim[Double](ksub, dsub)
        val cnt = new Array[Int](ksub)
        r = 0
        while (r < n) {
          val a = assign(r); cnt(a) += 1
          var t = 0
          while (t < dsub) { sums(a)(t) += vecs(r)(off + t); t += 1 }
          r += 1
        }
        var j = 0
        while (j < ksub) {
          if (cnt(j) > 0) {
            var t = 0
            while (t < dsub) { cb(j)(t) = (sums(j)(t) / cnt(j)).toFloat; t += 1 }
          }
          j += 1
        }
        it += 1
      }
      // final encode from the trained codebook
      var r = 0
      while (r < n) {
        var best = 0; var bestD = Double.MaxValue
        var j = 0
        while (j < ksub) {
          var s = 0.0; var t = 0
          val c = cb(j)
          while (t < dsub) {
            val dd = vecs(r)(off + t).toDouble - c(t); s += dd * dd; t += 1
          }
          if (s < bestD) { bestD = s; best = j }
          j += 1
        }
        codes(r)(mi) = best.toByte
        r += 1
      }
      codebooks(mi) = cb
      mi += 1
    }
    (codebooks, codes)
  }
}

/** ADC ranking of cells through the coarse-PQ codes (codegen entry
  * point): per-query subspace LUT, then a scan of the nlist codes —
  * IndexPQ::search over the centroid table with k = nprobe. */
private[graft] object CoarsePqKernels {
  def adcNearestK(a: ArrayData, codebooks: Array[Array[Array[Float]]],
      codes: Array[Array[Byte]], nprobe: Int): ArrayData = {
    val m = codebooks.length
    val ksub = codebooks(0).length
    val dsub = codebooks(0)(0).length
    val lut = Array.ofDim[Double](m, ksub)
    var mi = 0
    while (mi < m) {
      val cb = codebooks(mi); val off = mi * dsub
      var j = 0
      while (j < ksub) {
        val c = cb(j); var s = 0.0; var t = 0
        while (t < dsub) { val d = a.getFloat(off + t).toDouble - c(t); s += d * d; t += 1 }
        lut(mi)(j) = s; j += 1
      }
      mi += 1
    }
    val h = new TopKHeap(math.min(nprobe, codes.length), asc = true)
    var i = 0
    while (i < codes.length) {
      val code = codes(i); var s = 0.0; var mm = 0
      while (mm < m) { s += lut(mm)(code(mm) & 0xff); mm += 1 }
      h.insert(s, i.toLong)
      i += 1
    }
    val (ids, scores) = h.sorted()
    val out = new Array[Any](ids.length)
    var k = 0
    while (k < ids.length) { out(k) = InternalRow(ids(k).toInt, scores(k)); k += 1 }
    new GenericArrayData(out)
  }
}

/** Top-nprobe cells ranked by coarse-PQ ADC distance — probe
  * selection under the reference's `IVF<n>(PQ<m>[x<k>])` paren coarse
  * (the quantizer is an IndexPQ over the centroids, so both add-time
  * assignment and search-time probes rank by ADC, not the exact
  * argmin). Same output contract as [[NearestCentroids]]; ties break
  * on the lower list_no. */
case class NearestCentroidsAdc(child: Expression,
    codebooks: Array[Array[Array[Float]]], codes: Array[Array[Byte]],
    nprobe: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("list_no", IntegerType, nullable = false),
    StructField("dist", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "nearest_centroids_adc"

  override def nullSafeEval(v: Any): Any =
    CoarsePqKernels.adcNearestK(v.asInstanceOf[ArrayData], codebooks,
      codes, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    val cs = ctx.addReferenceObj("codes", codes, "byte[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.core.CoarsePqKernels.adcNearestK($c, $cb, $cs, $nprobe)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
