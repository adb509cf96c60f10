package graft.knn

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Per-partition NSG accelerator (faiss/IndexNSG.h:26 capability) and
  * the NNDescent-as-index mode (faiss/IndexNNDescent.h:23): LocalNsg
  * invariants on synthetic data plus recall of the sharded search
  * against the exact path. */
class NsgSpec extends SparkTestBase {

  private def mk(n: Int, d: Int, seed: Int): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(Array.fill(d)(rnd.nextFloat()))
  }

  private def exactTopk(pts: Array[Array[Float]], q: Array[Float], k: Int): Seq[Long] =
    pts.zipWithIndex.map { case (v, i) =>
      val dd = v.zip(q).map { case (a, b) => (a.toDouble - b) * (a.toDouble - b) }.sum
      (dd, i.toLong)
    }.sortBy(t => (t._1, t._2)).take(k).map(_._2).toSeq

  test("LocalNsg: exact when searchL >= n (full pool degenerate)") {
    val pts = mk(300, 8, 7)
    val g = new LocalNsg(Array.tabulate(300)(_.toLong), pts, gk = 16, r = 16, buildL = 32)
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 5) {
      val q = Array.fill(8)(rnd.nextFloat())
      val got = g.search(q, 5, searchL = 300).map(_._1).toSeq
      assert(got == exactTopk(pts, q, 5), "degenerate search must equal brute force")
    }
  }

  test("LocalNsg: degree bound R holds after reverse links + tree_grow") {
    val pts = mk(500, 8, 3)
    val g = new LocalNsg(Array.tabulate(500)(_.toLong), pts, gk = 24, r = 12, buildL = 48)
    assert(g.maxDegree <= 12, s"maxDegree ${g.maxDegree} > R=12")
  }

  test("LocalNsg: recall@10 >= 0.9 at searchL=64 on 3k vectors (HNSW-bootstrap path)") {
    val pts = mk(3000, 16, 9)  // n > 2048 exercises the bootstrap branch
    val g = new LocalNsg(Array.tabulate(3000)(_.toLong), pts, gk = 32, r = 32, buildL = 64)
    val rnd = new scala.util.Random(21)
    var hit = 0; var tot = 0
    for (_ <- 0 until 20) {
      val q = Array.fill(16)(rnd.nextFloat())
      val want = exactTopk(pts, q, 10).toSet
      val got = g.search(q, 10, searchL = 64).map(_._1).toSet
      hit += (want intersect got).size; tot += want.size
    }
    val recall = hit.toDouble / tot
    assert(recall >= 0.9, s"recall $recall < 0.9")
  }

  test("LocalNsg: unpruned (NNDescent-as-index) search reaches recall >= 0.8") {
    val pts = mk(1500, 12, 17)
    val g = new LocalNsg(Array.tabulate(1500)(_.toLong), pts,
      gk = 24, r = 24, buildL = 48, prune = false)
    val rnd = new scala.util.Random(23)
    var hit = 0; var tot = 0
    for (_ <- 0 until 20) {
      val q = Array.fill(12)(rnd.nextFloat())
      val want = exactTopk(pts, q, 10).toSet
      val got = g.search(q, 10, searchL = 64).map(_._1).toSet
      hit += (want intersect got).size; tot += want.size
    }
    val recall = hit.toDouble / tot
    assert(recall >= 0.8, s"recall $recall < 0.8")
  }

  test("PartitionedNsg: recall@10 >= 0.9 vs exact on 10k vectors") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(13)
    val base = (0 until 10000).map(i => (i.toLong, Seq.fill(16)(rnd.nextFloat())))
      .toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
      .repartition(8)
      .cache()
    val queries = base.filter(col("id") % 500 === 0)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val exact = Knn.knnJoin(queries, base, 10).select("qid", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = PartitionedNsg
      .knnJoin(queries, base, 10, gk = 32, r = 32, buildL = 64, searchL = 96)
      .select("qid", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    base.unpersist()
    assert(recall >= 0.9, s"recall $recall < 0.9")
  }

  test("LocalNsgSq: exact-degenerate equals brute-force ADC over codes") {
    val rnd = new scala.util.Random(11)
    val d = 8
    val pts = mk(300, d, 31)
    // minmax range per dim, as SqIndex.trainRange would compute
    val vmin = Array.tabulate(d)(i => pts.map(_(i).toDouble).min)
    val vmax = Array.tabulate(d)(i => pts.map(_(i).toDouble).max)
    val vdiff = Array.tabulate(d)(i => vmax(i) - vmin(i))
    def enc(v: Array[Float]): Array[Byte] = Array.tabulate(d) { i =>
      var xi = 0.0
      if (vdiff(i) != 0.0) {
        xi = (v(i).toDouble - vmin(i)) / vdiff(i)
        if (xi < 0) xi = 0; if (xi > 1) xi = 1
      }
      (255.0 * xi).toInt.toByte
    }
    def adc(q: Array[Float], c: Array[Byte]): Double = {
      var s = 0.0; var i = 0
      while (i < d) {
        val dec = vmin(i) + ((c(i) & 0xff) + 0.5) / 255.0 * vdiff(i)
        val df = q(i).toDouble - dec; s += df * df; i += 1
      }
      s
    }
    val codes = pts.map(enc)
    val g = new LocalNsgSq(vmin, vdiff, Array.tabulate(300)(_.toLong), codes,
      gk = 16, r = 16, buildL = 32)
    for (_ <- 0 until 5) {
      val q = Array.fill(d)(rnd.nextFloat())
      val got = g.search(q, 5, searchL = 300).toSeq
      val want = codes.zipWithIndex
        .map { case (c, i) => (adc(q, c), i.toLong) }
        .sortBy(t => (t._1, t._2)).take(5).map(t => (t._2, t._1)).toSeq
      assert(got == want, s"got $got want $want")
    }
  }

  test("LocalNsgSq: SQ8-bootstrap path (n > 2048) keeps recall >= 0.85") {
    val d = 12
    val pts = mk(3000, d, 41)  // n > 2048 exercises the LocalHnswSq bootstrap
    val vmin = Array.tabulate(d)(i => pts.map(_(i).toDouble).min)
    val vmax = Array.tabulate(d)(i => pts.map(_(i).toDouble).max)
    val vdiff = Array.tabulate(d)(i => vmax(i) - vmin(i))
    def enc(v: Array[Float]): Array[Byte] = Array.tabulate(d) { i =>
      var xi = 0.0
      if (vdiff(i) != 0.0) {
        xi = (v(i).toDouble - vmin(i)) / vdiff(i)
        if (xi < 0) xi = 0; if (xi > 1) xi = 1
      }
      (255.0 * xi).toInt.toByte
    }
    val g = new LocalNsgSq(vmin, vdiff, Array.tabulate(3000)(_.toLong), pts.map(enc),
      gk = 32, r = 32, buildL = 64)
    val rnd = new scala.util.Random(43)
    var hit = 0; var tot = 0
    for (_ <- 0 until 20) {
      val q = Array.fill(d)(rnd.nextFloat())
      val want = exactTopk(pts, q, 10).toSet
      val got = g.search(q, 10, searchL = 64).map(_._1).toSet
      hit += (want intersect got).size; tot += want.size
    }
    val recall = hit.toDouble / tot
    assert(recall >= 0.85, s"recall $recall < 0.85")
  }

  test("PartitionedNsg.knnJoinSq: exhaustive searchL reproduces the flat SQ8 scan") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(23)
    val base = (0 until 3000).map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat())))
      .toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
      .repartition(4)
      .cache()
    val queries = base.filter(col("id") % 300 === 0)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val flat = graft.index.SqIndex.build(base, "id", "vec")
      .search(queries, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val graph = PartitionedNsg
      .knnJoinSq(queries, base, 10, gk = 32, r = 32, buildL = 64, searchL = 4096)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    base.unpersist()
    assert(graph == flat)
  }

  test("LocalNsgPq: exact-degenerate equals brute-force ADC over PQ codes") {
    val rnd = new scala.util.Random(53)
    val d = 16; val M = 4; val dsub = d / M; val ksub = 8
    val pts = mk(300, d, 59)
    val cbs = Array.fill(M, ksub, dsub)(rnd.nextFloat())
    def enc(v: Array[Float]): Array[Byte] = Array.tabulate(M) { mi =>
      var best = 0; var bd = Double.MaxValue
      for (j <- 0 until ksub) {
        var s = 0.0
        for (i <- 0 until dsub) { val df = v(mi * dsub + i).toDouble - cbs(mi)(j)(i); s += df * df }
        if (s < bd) { bd = s; best = j }
      }
      best.toByte
    }
    def adc(q: Array[Float], c: Array[Byte]): Double = {
      var s = 0.0
      for (mi <- 0 until M; i <- 0 until dsub) {
        val df = q(mi * dsub + i).toDouble - cbs(mi)(c(mi) & 0xff)(i); s += df * df
      }
      s
    }
    val codes = pts.map(enc)
    val g = new LocalNsgPq(cbs, Array.tabulate(300)(_.toLong), codes,
      gk = 16, r = 16, buildL = 32)
    for (_ <- 0 until 5) {
      val q = Array.fill(d)(rnd.nextFloat())
      val got = g.search(q, 5, searchL = 300).toSeq
      val want = codes.zipWithIndex
        .map { case (c, i) => (adc(q, c), i.toLong) }
        .sortBy(t => (t._1, t._2)).take(5).map(t => (t._2, t._1)).toSeq
      assert(got == want, s"got $got want $want")
    }
  }

  test("PartitionedNsg.knnJoinPq: exhaustive searchL reproduces the flat PQ ADC scan") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(61)
    val base = (0 until 2000).map(i => (i.toLong, Seq.fill(16)(rnd.nextFloat())))
      .toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
      .repartition(4)
      .cache()
    val queries = base.filter(col("id") % 250 === 0)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val idx = graft.index.PqIndex.build(base, "id", "vec", m = 4, ksub = 16, niter = 4)
    val flat = idx.search(queries, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val graph = PartitionedNsg
      .knnJoinPq(queries, base, 10, idx.model, gk = 32, r = 32, buildL = 64, searchL = 4096)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    base.unpersist()
    assert(graph == flat)
  }

  test("PartitionedNsg: deterministic across runs on a fixed partitioning") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(5)
    val base = (0 until 2000).map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat())))
      .toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
      .repartition(4, col("id"))
      .cache()
    val queries = base.filter(col("id") < 5)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    def run() = PartitionedNsg.knnJoin(queries, base, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = run(); val b = run()
    base.unpersist()
    assert(a == b, "same partitioning must give identical results")
  }
}
