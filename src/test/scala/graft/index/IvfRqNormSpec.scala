package graft.index

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The IVF-prefixed aq_norm clause (`IVF<n>,{RQ|LSQ}<L>x<nb>_N<norm>`,
  * index_factory.cpp:293-430; AQInvertedListScannerLUT,
  * IndexIVFAdditiveQuantizer.cpp:204): the quantized-norm LUT scan
  * over residual lists. The qint8 member is oracle-checked end-to-end
  * (`ivfrq_qnorm_search`); this spec closes the rest of the family —
  * every suffix builds and searches, the exact-norm member agrees
  * with the decompress scan, and the graph-coarse composition
  * degenerates to the exact plan at full walk budget. */
class IvfRqNormSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()
  private lazy val base: DataFrame = emb.filter(col("vec_id") >= 10)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))
  private def q: DataFrame = emb.filter(col("vec_id") < 8)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private def run(desc: String): DataFrame =
    IndexFactory.build(base, "id", "vec", desc, niter = 3).search(q, 5, nprobe = 4)

  test("every _N suffix under an IVF prefix builds and searches (both AQ families)") {
    for (st <- Seq("float", "qint8", "qint4", "cqint8", "cqint4", "rq2x4",
        "lsq2x4", "none");
        fam <- Seq("RQ", "LSQ")) {
      val r = run(s"IVF8,${fam}2x4_N$st").cache()
      val nq = q.count()
      assert(r.count() == nq * 5, s"$fam _N$st row count")
      // per query: ranks 1..5, distances ascending (the nonorm mode is
      // coarse_dis - 2<q-c,x_hat>, still ranked ascending under L2)
      val bad = r.groupBy(col("qid"))
        .agg(collect_list(struct(col("rank"), col("dist"))).as("rs"))
        .select(col("qid"), expr(
          "exists(rs, x -> exists(rs, y -> x.rank < y.rank AND x.dist > y.dist))").as("oops"))
        .filter(col("oops")).count()
      assert(bad == 0, s"$fam _N$st distances not ascending in rank")
      r.unpersist()
    }
  }

  test("_Nfloat LUT scan agrees with the decompress scan (exact stored norm)") {
    // same deterministic build underneath (coarse k-means + residual RQ
    // + beam-2/1-ICM encode, seed 1234): the LUT formula
    // ||q-c||^2 - 2<q-c,x_hat> + ||x_hat||^2 is the decompress distance
    // up to float-association error
    val lut = run("IVF8,RQ2x4_Nfloat")
      .select(col("qid"), col("id"), col("dist").as("dl"))
    val idx = IvfRq.build(base, "id", "vec", nlist = 8, levels = 2, k = 16,
      niterCoarse = 3, niterRq = 3, beam = 2, icmIters = 1, seed = 1234L)
    val dec = idx.search(q, 5, nprobe = 4)
      .select(col("qid"), col("id"), col("dist").as("dd"))
    val joined = lut.join(dec, Seq("qid", "id")).cache()
    val n = joined.count()
    // >= 90% of top-5 ids agree (float-tie flips only)
    assert(n >= (q.count() * 5 * 9) / 10, s"only $n/top-5 ids shared")
    val maxErr = joined
      .select(max(abs(col("dl") - col("dd")))).collect().head.getDouble(0)
    assert(maxErr < 1e-3, s"LUT vs decompress dist err $maxErr")
  }

  test("graph-coarse composition degenerates to the exact probe set at full budget") {
    // IVF8_HNSW16 walk budget max(32, 4*nprobe) covers all 8 centroids
    // -> identical probe sets -> identical rows (same build seed)
    val plain = run("IVF8,RQ2x4_Nqint8").collect().toSet
    val graph = run("IVF8_HNSW16,RQ2x4_Nqint8").collect().toSet
    assert(plain == graph)
  }

  test("product AQ under IVF: PRQ/PLSQ decompress + every _N suffix builds; " +
    "factory equals the twin-call build") {
    // decompress forms (empty norm clause = ST_decompress,
    // index_factory.cpp:351)
    for (desc <- Seq("IVF8,PRQ2x2x4", "IVF8,PLSQ2x2x4",
        "IVF8_HNSW16,PRQ2x2x4")) {
      val bb = IndexFactory.build(base, "id", "vec", desc, niter = 3)
      assert(bb.search(q, 5, nprobe = 4).count() == q.count() * 5, desc)
      bb.close()
    }
    // norm-clause forms over the effective model
    for (st <- Seq("float", "qint8", "none"); fam <- Seq("PRQ", "PLSQ")) {
      val bb = IndexFactory.build(base, "id", "vec",
        s"IVF8,${fam}2x2x4_N$st", niter = 3)
      assert(bb.search(q, 5, nprobe = 4).count() == q.count() * 5,
        s"$fam _N$st")
      bb.close()
    }
    // flat product norm clause too (index_factory.cpp:589,599)
    val fb = IndexFactory.build(base, "id", "vec", "PRQ2x2x4_Nqint8", niter = 3)
    assert(fb.search(q, 5).count() == q.count() * 5)
    fb.close()
    // factory route == the same deterministic calls done by hand
    // (coarse k-means, per-split residual RQ train, beam-2/1-ICM
    // encode, effective-model decompress scan)
    val viaFactory = IndexFactory.build(base, "id", "vec", "IVF8,PRQ2x2x4",
      niter = 3).search(q, 5, nprobe = 4).collect().toSet
    val km = graft.cluster.KMeans.fit(base, "vec",
      graft.cluster.KMeans.Params(k = 8, niter = 3, seed = 1234L))
    val assigned = km.assign(base, "vec")
      .join(broadcast(Probes.centroidsDf(spark, km.centroids)), "list_no")
      .select(col("id"), col("list_no"),
        graft.functions.vec_sub(col("vec"), col("centroid")).as("res"))
    val prq = Prq.train(assigned.select(col("res")), "res", nsplit = 2,
      levels = 2, k = 16, niter = 3, seed = 1234L, beam = 2)
    val twin = new IvfRqIndex(8, km.centroids,
      Rq4FastScanIndex.effectiveModel(prq),
      assigned.select(col("id"), col("list_no"),
        prq.encodeCol(col("res"), 2, 1).as("code")))
    assert(twin.search(q, 5, nprobe = 4).collect().toSet == viaFactory)
    // codeSize carries the norm bytes
    assert(IndexFactory.codeSize("PRQ2x2x4_Nqint8", 64) == 3)
    assert(IndexFactory.codeSize("IVF8,PLSQ2x2x4_Nfloat", 64) == 6)
    assert(IndexFactory.codeSize("IVF8,PRQ2x2x4", 64) == 2)
  }

  test("IVF,(ITQ|PCA|PCAR),SH: the reference spectral-hash spelling parses, " +
    "searches, and the thresholdless form degenerates to projection sign bits") {
    for (desc <- Seq("IVF8,PCA8,SH", "IVF8,PCAR8,SH0.5g", "IVF8,ITQ8,SHm",
        "IVF8,PCA8,SH1.0c")) {
      val bb = IndexFactory.build(base, "id", "vec", desc, niter = 3)
      val r = bb.search(q, 5, nprobe = 8)
      assert(r.count() == q.count() * 5, desc)
      bb.close()
    }
    assert(IndexFactory.codeSize("IVF8,PCA8,SH", 64) == 1)
    assert(IndexFactory.codeSize("IVF8,ITQ16,SH2.5g", 64) == 2)
  }

  test("codeSize includes the stored-norm bytes under the IVF prefix") {
    assert(IndexFactory.codeSize("IVF8,RQ2x4_Nqint8", 64) == 2)
    assert(IndexFactory.codeSize("IVF8,RQ2x4_Nnone", 64) == 1)
    assert(IndexFactory.codeSize("IVF8,RQ4x8_Nfloat", 64) == 8)
    assert(IndexFactory.codeSize("IVF8,LSQ2x4_Nlsq2x4", 64) == 2)
  }

  test("reverse factory string survives the norm clause") {
    val b = IndexFactory.build(base, "id", "vec", "IVF8,RQ2x4_Ncqint4", niter = 3)
    assert(b.description == "IVF8,RQ2x4_Ncqint4")
    b.close()
  }
}
