package graft.index

import graft.SparkTestBase
import graft.core.RqKernels
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData

class RqSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  test("addFromFlatCodes: bulk-loaded IVF-RQ reconstructs the full RQ decode without vectors") {
    val base = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val model = Rq.train(base.select(col("vec")), "vec", levels = 2, k = 16, niter = 3)
    val codes = base.select(col("id"), model.encodeCol(col("vec")).as("codes"))
    val ivf = IvfRq.addFromFlatCodes(model, codes)
    assert(ivf.nlist == 16)
    // reconstruct (centroid + inner decode) == full-model decode
    val viaIvf = ivf.reconstruct.select(col("id"), col("vec"))
    val direct = codes.select(col("id"), model.decodeCol(col("codes")).as("vec"))
    val diff = viaIvf.join(direct.withColumnRenamed("vec", "dvec"), "id")
      .select(aggregate(zip_with(col("vec").cast("array<double>"),
        col("dvec").cast("array<double>"), (x, y) => abs(x - y)),
        lit(0.0), (a, x) => a + x).as("e"))
      .agg(max(col("e"))).collect().head.getDouble(0)
    assert(diff == 0.0, s"decode mismatch $diff")
    // and a full-probe search runs over every bulk-loaded code
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    assert(ivf.search(q, 5, nprobe = 16).count() == 25)
  }

  private def totalErr(model: RqModel, beam: Int, icm: Int = 0): Double =
    emb.select(
      aggregate(
        zip_with(col("embedding").cast("array<double>"),
          model.roundtripCol(col("embedding"), beam, icm),
        (x, y) => (x - y) * (x - y)),
        lit(0.0), (a, x) => a + x).as("e"))
      .agg(sum(col("e"))).collect().head.getDouble(0)

  test("encodeBeam with beam=1 equals greedy encode") {
    val model = Rq.train(emb, "embedding", levels = 3, k = 16, niter = 4)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 30) {
      val v = new GenericArrayData(Array.fill(64)(rnd.nextFloat() * 2 - 1))
      assert(RqKernels.encodeBeam(v, model.codebooks, 1).toSeq ==
        RqKernels.encode(v, model.codebooks).toSeq)
    }
  }

  test("LUT search arithmetic: <q, decode(codes)> from LUT matches direct IP (ST_LUT_*)") {
    val model = Rq.train(emb, "embedding", levels = 2, k = 16, niter = 4)
    val got = emb.limit(20)
      .select(col("embedding"),
        model.encodeCol(col("embedding")).as("codes"))
      .select(
        model.ipFromLutCol(col("codes"), model.lutCol(col("embedding"))).as("viaLut"),
        aggregate(zip_with(col("embedding").cast("array<double>"),
          model.decodeCol(col("codes")).cast("array<double>"),
          (x, y) => x * y), lit(0.0), (a, x) => a + x).as("direct"))
      .collect()
    got.foreach { r =>
      // LUT distributes the IP over per-level codewords: identical up
      // to double-summation order (decode sums floats first)
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-4,
        s"viaLut ${r.getDouble(0)} vs direct ${r.getDouble(1)}")
    }
  }

  test("beam-search encoding strictly improves reconstruction error at equal code size") {
    // same codebooks (so exactly equal code size: L * log2(k) bits),
    // greedy vs beam=4 encoding — faiss refine_beam's claim
    val model = Rq.train(emb, "embedding", levels = 3, k = 16, niter = 4)
    val greedy = totalErr(model, beam = 1)
    val beamed = totalErr(model, beam = 4)
    assert(beamed < greedy, s"beam=4 err $beamed !< greedy err $greedy")
  }

  test("beam-trained codebooks (Train_top_beam) do not regress vs greedy-trained") {
    val greedyModel = Rq.train(emb, "embedding", levels = 3, k = 16, niter = 4)
    val beamModel = Rq.train(emb, "embedding", levels = 3, k = 16, niter = 4, beam = 4)
    val greedy = totalErr(greedyModel, beam = 1)
    val beamed = totalErr(beamModel, beam = 4)
    assert(beamed < greedy,
      s"beam-trained+beam-encoded err $beamed !< greedy pipeline err $greedy")
  }

  test("ICM refinement (LSQ encode loop) never hurts and improves greedy codes") {
    val model = Rq.train(emb, "embedding", levels = 3, k = 16, niter = 4)
    val greedy = totalErr(model, beam = 1)
    val icm = totalErr(model, beam = 1, icm = 4)
    assert(icm <= greedy + 1e-6, s"ICM $icm worse than its greedy seed $greedy")
    assert(icm < greedy, s"ICM $icm did not improve greedy $greedy on real data")
    // ICM on top of beam search is also a pure descent from the seed
    val beamed = totalErr(model, beam = 4)
    val both = totalErr(model, beam = 4, icm = 4)
    assert(both <= beamed + 1e-6, s"beam+ICM $both worse than beam $beamed")
  }

  test("PRQ: per-split decode concatenation reconstructs, more splits cut error at same levels/k") {
    val rq = Rq.train(emb, "embedding", levels = 2, k = 16, niter = 4)
    val prq = Prq.train(emb, "embedding", nsplit = 2, levels = 2, k = 16, niter = 4)
    val eRq = totalErr(rq, beam = 1)
    val ePrq = emb.select(
      aggregate(
        zip_with(col("embedding").cast("array<double>"),
          prq.roundtripCol(col("embedding")),
        (x, y) => (x - y) * (x - y)),
        lit(0.0), (a, x) => a + x).as("e"))
      .agg(sum(col("e"))).collect().head.getDouble(0)
    // 2 splits double the code budget at equal levels/k — error must drop
    assert(ePrq < eRq, s"PRQ $ePrq !< RQ $eRq")
    // decoded width = d
    val n = emb.select(size(prq.roundtripCol(col("embedding")))).first().getInt(0)
    assert(n == 64)
  }

  test("IVF-RQ: exact-degenerate at nprobe=nlist, recall floor at nprobe=2") {
    import graft.knn.Knn
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val b = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val idx = IvfRq.build(b, "id", "vec", nlist = 4, levels = 2, k = 16,
      niterCoarse = 3, niterRq = 3, beam = 2, icmIters = 1)
    // nprobe = nlist scans everything: must equal the flat
    // reconstruction-distance search over the same decoded vectors
    val full = idx.search(q, 5, nprobe = 4).select("qid", "id").collect().toSet
    val flatTwin = Knn.knnJoin(q,
      idx.reconstruct.withColumnRenamed("vec", "vec").join(
        b.select(col("id")), "id"), 5)
      .select("qid", "id").collect().toSet
    assert(full == flatTwin)
    // pruning (nprobe=2 of 4) must retain most of the full
    // reconstruction-distance search's results (2x16 codes on d=64 are
    // far too lossy to gate against the EXACT search — rq_search's
    // oracle checks code correctness, this checks pruning quality)
    val rec = graft.eval.Recall.mean(
      idx.search(q, 5, nprobe = 4), idx.search(q, 5, nprobe = 2))
    assert(rec > 0.5, s"pruned-vs-full recall $rec")
  }

  test("wider beam is monotone non-increasing in error") {
    val model = Rq.train(emb, "embedding", levels = 2, k = 16, niter = 4)
    val e1 = totalErr(model, 1); val e2 = totalErr(model, 2); val e8 = totalErr(model, 8)
    assert(e2 <= e1 + 1e-6, s"$e2 > $e1")
    assert(e8 <= e2 + 1e-6, s"$e8 > $e2")
  }

  test("quantized-norm codecs (ST_norm_qint/cqint): error ordering and exact assignment") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val norms = (0 until 200).map(i => (i.toLong, 1.0 + 0.05 * i + (i % 7) * 0.013))
      .toDF("id", "n")
    def mse(dec: org.apache.spark.sql.Column): Double =
      norms.select(pow(col("n") - dec, 2).as("e")).agg(avg("e")).first().getDouble(0)
    val (nmin, nmax) = RqNorms.range(norms, "n")
    val e8 = mse(RqNorms.qintDecode(col("n"), 256, nmin, nmax))
    val e4 = mse(RqNorms.qintDecode(col("n"), 16, nmin, nmax))
    assert(e8 <= e4, s"qint8 mse $e8 > qint4 mse $e4")
    val c16 = RqNorms.cqCentroids(norms, "n", 16)
    val c256 = RqNorms.cqCentroids(norms, "n", 256)
    val ce4 = mse(RqNorms.cqDecode(col("n"), c16))
    val ce8 = mse(RqNorms.cqDecode(col("n"), c256))
    assert(ce8 <= ce4, s"cqint8 mse $ce8 > cqint4 mse $ce4")
    // codebook assignment decodes to the argmin centroid exactly
    val got = norms.select(col("n"), RqNorms.cqDecode(col("n"), c16).as("d"))
      .collect()
    got.foreach { r =>
      val n = r.getDouble(0)
      val want = c16.minBy(c => (math.abs(c - n), c16.indexOf(c)))
      assert(r.getDouble(1) == want, s"norm $n -> ${r.getDouble(1)} != $want")
    }
    // the k-means codebook is no worse than uniform at the same budget
    assert(ce4 <= e4 + 1e-9, s"cq codebook mse $ce4 > uniform mse $e4")
  }
}
