package graft.index

import graft.SparkTestBase
import graft.core.RqKernels
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData

class RqSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  private def totalErr(model: RqModel, beam: Int): Double =
    emb.select(
      aggregate(
        zip_with(col("embedding").cast("array<double>"),
          model.roundtripCol(col("embedding"), beam),
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

  test("wider beam is monotone non-increasing in error") {
    val model = Rq.train(emb, "embedding", levels = 2, k = 16, niter = 4)
    val e1 = totalErr(model, 1); val e2 = totalErr(model, 2); val e8 = totalErr(model, 8)
    assert(e2 <= e1 + 1e-6, s"$e2 > $e1")
    assert(e8 <= e2 + 1e-6, s"$e8 > $e2")
  }
}
