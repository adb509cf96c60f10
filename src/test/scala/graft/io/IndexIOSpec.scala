package graft.io

import graft.SparkTestBase
import graft.index.{PqIndex, SqIndex}
import graft.transform._
import org.apache.spark.sql.functions._

class IndexIOSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()
  private def q = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
  private def b = emb.filter(col("vec_id") >= 10)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private def results(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "rank", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("SQ index save/load round-trip preserves search results") {
    val idx = SqIndex.build(b, "id", "vec")
    val dir = java.nio.file.Files.createTempDirectory("sqio").toString
    IndexIO.saveSq(idx, dir)
    val loaded = IndexIO.loadSq(spark, dir)
    assert(results(loaded.search(q, 5)) == results(idx.search(q, 5)))
  }

  test("SQ save/load round-trips every quantizer width, including rangeless fp16") {
    for (qtype <- Seq("SQ4", "SQ6", "fp16")) {
      val idx = SqIndex.build(b, "id", "vec", qtype = qtype)
      val dir = java.nio.file.Files.createTempDirectory(s"sqio_$qtype").toString
      IndexIO.saveSq(idx, dir)
      val loaded = IndexIO.loadSq(spark, dir)
      assert(loaded.qtype == qtype, s"qtype lost: ${loaded.qtype}")
      assert(results(loaded.search(q, 5)) == results(idx.search(q, 5)), qtype)
    }
  }

  test("PQ index save/load round-trip preserves search results") {
    val idx = PqIndex.build(b, "id", "vec", m = 8, ksub = 16, niter = 3)
    val dir = java.nio.file.Files.createTempDirectory("pqio").toString
    IndexIO.savePq(idx, dir)
    val loaded = IndexIO.loadPq(spark, dir)
    assert(results(loaded.search(q, 5)) == results(idx.search(q, 5)))
    assert(loaded.model.ksub == 16 && loaded.model.m == 8)
  }

  test("IVFPQ index save/load round-trip preserves search results and pruning layout") {
    val idx = graft.index.IvfPqIndex.build(b, "id", "vec",
      nlist = 4, m = 8, ksub = 16, niterCoarse = 3, niterPq = 3)
    val dir = java.nio.file.Files.createTempDirectory("ivfpqio").toString
    IndexIO.saveIvfPq(idx, dir)
    val loaded = IndexIO.loadIvfPq(spark, dir)
    assert(results(loaded.search(q, 5, nprobe = 4)) ==
      results(idx.search(q, 5, nprobe = 4)))
    // list_no-partitioned on disk: static pruning survives the reload
    val parts = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.getName.startsWith("list_no=")).map(_.getName)
    assert(parts.nonEmpty)
  }

  test("fast-scan save/load: PQ4fs, IVF-PQ4fs (partitioned) and the rescaling " +
    "RQ4fs all round-trip bit-identically, including the trained norm_scale") {
    val fs = graft.index.Pq4FastScanIndex.build(b, "id", "vec", m = 8, niter = 3)
    val d1 = java.nio.file.Files.createTempDirectory("pq4fsio").toString
    IndexIO.savePq4Fs(fs, d1)
    assert(results(IndexIO.loadPq4Fs(spark, d1).search(q, 5)) ==
      results(fs.search(q, 5)))
    val ivf = graft.index.IvfPq4FastScanIndex.build(b, "id", "vec", nlist = 4,
      m = 8, niterCoarse = 2, niterPq = 3)
    val d2 = java.nio.file.Files.createTempDirectory("ivfpq4fsio").toString
    IndexIO.saveIvfPq4Fs(ivf, d2)
    val ivfLoaded = IndexIO.loadIvfPq4Fs(spark, d2)
    assert(results(ivfLoaded.search(q, 5, nprobe = 2)) ==
      results(ivf.search(q, 5, nprobe = 2)))
    // adversarial magnitudes -> norm_scale > 1; the reload must carry it
    // (a lost scale would quantize UNdivided norm columns and scan
    // unscaled — different integer distances)
    val adv = b.select(col("id"), transform(col("vec"), x =>
      x * (lit(1.0f) + pmod(col("id"), lit(4)).cast("float") * lit(5.0f))).as("vec"))
    val rs = graft.index.Rq4FastScanIndex.build(adv, "id", "vec", levels = 2, niter = 3)
    assert(rs.normScale > 1)
    val d3 = java.nio.file.Files.createTempDirectory("rq4fsio").toString
    IndexIO.saveRq4Fs(rs, d3)
    val rsLoaded = IndexIO.loadRq4Fs(spark, d3)
    assert(rsLoaded.normScale == rs.normScale, "trained norm_scale lost")
    assert(results(rsLoaded.search(q, 5)) == results(rs.search(q, 5)))
  }

  test("IVF AQ fast-scan save/load: both residual forms round-trip " +
    "bit-identically; the by_residual meta flag guards cross-loading") {
    val ivf = graft.index.IvfRq4FastScanIndex.build(b, "id", "vec",
      nlist = 4, levels = 2, niterCoarse = 2, niter = 3)
    val d1 = java.nio.file.Files.createTempDirectory("ivfrq4fsio").toString
    IndexIO.saveIvfRq4Fs(ivf, d1)
    assert(results(IndexIO.loadIvfRq4Fs(spark, d1).search(q, 5, nprobe = 2)) ==
      results(ivf.search(q, 5, nprobe = 2)))
    val ivfr = graft.index.IvfRq4FastScanRIndex.build(b, "id", "vec",
      nlist = 4, levels = 2, niterCoarse = 2, niter = 3)
    val d2 = java.nio.file.Files.createTempDirectory("ivfrq4fsrio").toString
    IndexIO.saveIvfRq4FsR(ivfr, d2)
    assert(results(IndexIO.loadIvfRq4FsR(spark, d2).search(q, 5, nprobe = 2)) ==
      results(ivfr.search(q, 5, nprobe = 2)))
    // loading a residual store through the non-residual entry (or vice
    // versa) would silently score residual codes against raw-vector
    // LUTs — the meta flag makes it loud
    intercept[IllegalArgumentException](IndexIO.loadIvfRq4Fs(spark, d2))
    intercept[IllegalArgumentException](IndexIO.loadIvfRq4FsR(spark, d1))
    val pqr = graft.index.IvfPq4FastScanRIndex.build(b, "id", "vec",
      nlist = 4, m = 8, niterCoarse = 2, niterPq = 3)
    val d3 = java.nio.file.Files.createTempDirectory("ivfpq4fsrio").toString
    IndexIO.saveIvfPq4FsR(pqr, d3)
    val loaded = IndexIO.loadIvfPq4FsR(spark, d3)
    def r4set(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "id", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(r4set(loaded.search(q, 5, nprobe = 2)) ==
      r4set(pqr.search(q, 5, nprobe = 2)))
    pqr.close(); loaded.close(); ivfr.close()
  }

  test("Index2Layer save/load round-trip preserves reconstruction") {
    val idx = graft.index.TwoLayerIndex.build(b, "id", "vec",
      nlist = 4, m = 8, ksub = 16, niterCoarse = 3, niterPq = 3)
    val dir = java.nio.file.Files.createTempDirectory("twolayerio").toString
    IndexIO.saveTwoLayer(idx, dir)
    val loaded = IndexIO.loadTwoLayer(spark, dir)
    def recon(i: graft.index.TwoLayerIndex) =
      i.reconstruct.select(col("id"),
        round(element_at(col("vec"), 1).cast("double"), 5).as("v"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(recon(loaded) == recon(idx))
  }

  test("Binary IVF save/load round-trip preserves search results") {
    val idx = graft.index.BinaryIvfIndex.buildFromVectors(b, "id", "vec",
      nlist = 4, niter = 3)
    val dir = java.nio.file.Files.createTempDirectory("bivfio").toString
    IndexIO.saveBinaryIvf(idx, dir)
    val loaded = IndexIO.loadBinaryIvf(spark, dir)
    val qc = q.select(col("qid"), graft.functions.sign_bits(col("qvec")).as("qcode"))
    assert(results(loaded.search(qc, 5, nprobe = 4)) ==
      results(idx.search(qc, 5, nprobe = 4)))
  }

  test("IMI save/load round-trip preserves search results") {
    val idx = graft.index.ImiIndex.build(b, "id", "vec", ksub = 4, niter = 3)
    val dir = java.nio.file.Files.createTempDirectory("imiio").toString
    IndexIO.saveImi(idx, dir)
    val loaded = IndexIO.loadImi(spark, dir)
    assert(results(loaded.search(q, 5, nprobe = loaded.nlist)) ==
      results(idx.search(q, 5, nprobe = idx.nlist)))
  }

  test("IMI+PQ save/load round-trip preserves search results (write_index " +
      "of the SIFT1B flagship composition)") {
    val idx = graft.index.ImiPqIndex.build(b, "id", "vec", ksub = 4,
      m = 8, pqKsub = 16, niterCoarse = 3, niterPq = 3)
    val dir = java.nio.file.Files.createTempDirectory("imipqio").toString
    IndexIO.saveImiPq(idx, dir)
    val loaded = IndexIO.loadImiPq(spark, dir)
    assert(loaded.ksub == idx.ksub)
    assert(results(loaded.search(q, 5, nprobe = 4)) ==
      results(idx.search(q, 5, nprobe = 4)))
    // the ht/max_codes knobs survive the round-trip too
    assert(results(loaded.search(q, 5, nprobe = 4, ht = Some(64),
      maxCodes = Some(1 << 20))) == results(idx.search(q, 5, nprobe = 4)))
  }

  test("Spectral-hash index save/load round-trip preserves search results") {
    val idx = graft.index.IvfSpectralHash.build(b, "id", "vec",
      nlist = 4, nbit = 16, period = 1.0, thresholdType = "median", niter = 2)
    val dir = java.nio.file.Files.createTempDirectory("shio").toString
    IndexIO.saveSpectralHash(idx, dir)
    val loaded = IndexIO.loadSpectralHash(spark, dir)
    assert(results(loaded.search(q, 5, nprobe = 4)) ==
      results(idx.search(q, 5, nprobe = 4)))
    assert(loaded.nbit == 16 && loaded.period == 1.0)
  }

  test("RQ model save/load round-trip reproduces the decode exactly") {
    val m = graft.index.Rq.train(b, "vec", levels = 2, k = 8, niter = 3)
    val dir = java.nio.file.Files.createTempDirectory("rqio").toString
    IndexIO.saveRq(spark, m, dir)
    val loaded = IndexIO.loadRq(spark, dir)
    def rt(mm: graft.index.RqModel) =
      b.select(col("id"), round(element_at(mm.roundtripCol(col("vec")), 1)
        .cast("double"), 6).as("v"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(rt(loaded) == rt(m))
  }

  test("merge_ondisk analog: two saved IVF indexes merge into one on-disk store") {
    // contrib/ondisk.py:13 merge_ondisk — here: load both, mergeFrom
    // (same trained quantizer), save; the merged store answers like an
    // index built over the union.
    import org.apache.spark.sql.graft.shim
    val b1 = b.filter(col("id") % 2 === 0)
    val b2 = b.filter(col("id") % 2 === 1)
    val idx1 = graft.index.IvfIndex.build(b1, "id", "vec", nlist = 4, niter = 3)
    // shard 2 shares the trained quantizer (merge's precondition)
    def inv(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("_a", shim.col(
        graft.core.NearestCentroid(shim.expr(col("vec")), idx1.centroids)))
      .select(col("id"), col("vec"), col("_a.list_no").as("list_no"))
    val idx2 = new graft.index.IvfIndex(idx1.d, idx1.metric, idx1.nlist,
      idx1.centroids, inv(b2))
    val d1 = java.nio.file.Files.createTempDirectory("ivfm1").toString
    val d2 = java.nio.file.Files.createTempDirectory("ivfm2").toString
    val dm = java.nio.file.Files.createTempDirectory("ivfmerged").toString
    idx1.save(d1); idx2.save(d2)
    val merged = graft.index.IvfIndex.load(spark, d1)
      .mergeFrom(graft.index.IvfIndex.load(spark, d2))
    merged.save(dm)
    val got = results(graft.index.IvfIndex.load(spark, dm)
      .search(q, 5, nprobe = 4))
    val want = results(new graft.index.IvfIndex(idx1.d, idx1.metric,
      idx1.nlist, idx1.centroids, inv(b)).search(q, 5, nprobe = 4))
    assert(got == want)
  }

  test("transform chain save/load round-trip applies identically") {
    val chain = Chain(Seq(
      Centering.train(emb, "embedding"),
      Transforms.pca(emb, "embedding", 8),
      Normalization))
    val dir = java.nio.file.Files.createTempDirectory("tio").toString + "/t"
    IndexIO.saveTransform(spark, chain, dir)
    val loaded = IndexIO.loadTransform(spark, dir)
    val a = emb.limit(20).select(chain.applyCol(col("embedding")).as("y")).collect()
    val c = emb.limit(20).select(loaded.applyCol(col("embedding")).as("y")).collect()
    a.zip(c).foreach { case (x, y) =>
      val xs = x.getSeq[Float](0); val ys = y.getSeq[Float](0)
      xs.zip(ys).foreach { case (u, v) => assert(math.abs(u - v) < 1e-6) }
    }
  }
}
