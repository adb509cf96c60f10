package graft.knn

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Per-partition HNSW accelerator: recall against the exact path, plus
  * LocalHnsw invariants on synthetic data. */
class HnswSpec extends SparkTestBase {

  test("LocalHnsw: exact on tiny data (ef >= n degenerates to scan)") {
    val rnd = new scala.util.Random(7)
    val pts = Array.fill(200)(Array.fill(8)(rnd.nextFloat()))
    val g = new LocalHnsw(m = 8, efConstruction = 64, seed = 1L)
    pts.zipWithIndex.foreach { case (v, i) => g.add(i.toLong, v) }
    val q = Array.fill(8)(rnd.nextFloat())
    val got = g.search(q, 5, efSearch = 200).map(_._1).toSeq
    val want = pts.zipWithIndex.map { case (v, i) =>
      val d = v.zip(q).map { case (a, b) => (a.toDouble - b) * (a.toDouble - b) }.sum
      (d, i.toLong)
    }.sortBy(t => (t._1, t._2)).take(5).map(_._2).toSeq
    assert(got == want, s"got $got want $want")
  }

  test("PartitionedHnsw: recall@10 >= 0.9 vs exact on 10k vectors") {
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
    val approx = PartitionedHnsw
      .knnJoin(queries, base, 10, m = 16, efConstruction = 96, efSearch = 128)
      .select("qid", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    base.unpersist()
    assert(recall >= 0.9, s"recall $recall < 0.9")
  }

  test("LocalHnswSq: exact-degenerate equals brute-force ADC over codes") {
    val rnd = new scala.util.Random(11)
    val d = 8
    val pts = Array.fill(300)(Array.fill(d)(rnd.nextFloat()))
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
    val g = new LocalHnswSq(vmin, vdiff, m = 8, efConstruction = 64, seed = 1L)
    val codes = pts.map(enc)
    codes.zipWithIndex.foreach { case (c, i) => g.add(i.toLong, c) }
    val q = Array.fill(d)(rnd.nextFloat())
    val got = g.search(q, 5, efSearch = 300).toSeq
    val want = codes.zipWithIndex
      .map { case (c, i) => (adc(q, c), i.toLong) }
      .sortBy(t => (t._1, t._2)).take(5).map(t => (t._2, t._1)).toSeq
    assert(got == want, s"got $got want $want")
  }

  test("PartitionedHnsw.knnJoinSq: exhaustive ef reproduces the flat SQ8 scan") {
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
    val graph = PartitionedHnsw
      .knnJoinSq(queries, base, 10, m = 16, efConstruction = 64, efSearch = 4096)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    base.unpersist()
    assert(graph == flat)
  }

  test("LocalHnswPq: exact-degenerate equals brute-force ADC over PQ codes") {
    val rnd = new scala.util.Random(17)
    val d = 16; val M = 4; val dsub = d / M; val ksub = 8
    val pts = Array.fill(300)(Array.fill(d)(rnd.nextFloat()))
    // random codebooks (training quality is irrelevant to the contract)
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
    val g = new LocalHnswPq(cbs, m = 8, efConstruction = 64, seed = 1L)
    codes.zipWithIndex.foreach { case (c, i) => g.add(i.toLong, c) }
    val q = Array.fill(d)(rnd.nextFloat())
    val got = g.search(q, 5, efSearch = 300).toSeq
    val want = codes.zipWithIndex
      .map { case (c, i) => (adc(q, c), i.toLong) }
      .sortBy(t => (t._1, t._2)).take(5).map(t => (t._2, t._1)).toSeq
    assert(got == want, s"got $got want $want")
  }

  test("PartitionedHnsw.knnJoinPq: exhaustive ef reproduces the flat PQ ADC scan") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(29)
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
    val graph = PartitionedHnsw
      .knnJoinPq(queries, base, 10, idx.model, m = 16, efConstruction = 64, efSearch = 4096)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    base.unpersist()
    assert(graph == flat)
  }

  test("PartitionedHnsw: deterministic across runs on a fixed partitioning") {
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
    def run() = PartitionedHnsw.knnJoin(queries, base, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = run(); val b = run()
    base.unpersist()
    assert(a == b)
  }

  test("ReconstructFromNeighbors: identity codebook rerank is a no-op; " +
      "lossy codebook keeps recall (IndexHNSW.cpp:620-860)") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val b = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val graph = KnnGraph.exact(b, 4).cache()
    def resultSet(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stage1 = PartitionedHnsw.knnJoin(q, b, 10,
      m = 16, efConstruction = 64, efSearch = 4096)
    // k = 1, beta = [1, 0, ...]: reconstruction == stored vector, so
    // the reorder must reproduce the shortlist's exact ranking
    val identity = ReconstructFromNeighbors.encode(
      b, graph, Array(Array(1f, 0f, 0f, 0f, 0f)))
    assert(resultSet(ReconstructFromNeighbors.rerank(stage1, q, identity, 10)) ==
      resultSet(stage1))
    assert(identity.filter(col("err") > 1e-12).count() == 0,
      "identity reconstruction must have zero error")
    // lossy smoothing codebook: estimate_code picks a REAL argmin
    // (several rows in use) and reranked recall@10 stays useful
    val lossy = ReconstructFromNeighbors.encode(
      b, graph, ReconstructFromNeighbors.smoothingCodebook(4, 4)).cache()
    assert(lossy.select("code").distinct().count() >= 2,
      "smoothing codebook should select more than one row across the base")
    val reranked = resultSet(ReconstructFromNeighbors.rerank(stage1, q, lossy, 10))
    val orig = resultSet(stage1)
    // k_reorder never changes the candidate SET, only the order
    // (IndexHNSW.cpp:334-345 resorts the shortlist in place)
    assert(reranked.map { case (a, _, c) => (a, c) } ==
      orig.map { case (a, _, c) => (a, c) })
    // ...and a lossy reconstruction really does move some ranks
    assert(reranked != orig,
      "smoothing reconstruction should reorder at least one shortlist")
    lossy.unpersist(); graph.unpersist()
  }
}
