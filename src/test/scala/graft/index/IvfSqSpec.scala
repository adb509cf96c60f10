package graft.index

import graft.SparkTestBase
import graft.knn.Knn
import graft.eval.Recall
import org.apache.spark.sql.functions._

class IvfSqSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()
  private def q = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
  private def b = emb.filter(col("vec_id") >= 10)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("residual IVF-SQ recall at least matches absolute encoding") {
    val truth = Knn.knnJoin(q, b, 10).cache()
    val absIdx = IvfSqIndex.build(b, "id", "vec", nlist = 8, niter = 3)
    val resIdx = IvfSqIndex.build(b, "id", "vec", nlist = 8, niter = 3,
      byResidual = true)
    val absRecall = Recall.mean(truth, absIdx.search(q, 10, nprobe = 8))
    val resRecall = Recall.mean(truth, resIdx.search(q, 10, nprobe = 8))
    // residuals concentrate near 0 -> finer quantization; allow tiny slack
    assert(resRecall >= absRecall - 0.05, s"res $resRecall vs abs $absRecall")
    assert(resRecall > 0.8, s"residual recall $resRecall")
    truth.unpersist()
  }

  test("SQ4/SQ6/fp16 widths: fused ADC equals L2 to the decoded vector") {
    for (qtype <- Seq("SQ4", "SQ6", "fp16")) {
      val idx = SqIndex.build(b, "id", "vec", qtype = qtype)
      val df = idx.codes.limit(50).crossJoin(broadcast(q.limit(3)))
        .select(
          org.apache.spark.sql.graft.shim.col(graft.index.SqVariant.adcL2(qtype,
            org.apache.spark.sql.graft.shim.expr(col("qvec")),
            org.apache.spark.sql.graft.shim.expr(col("code")),
            idx.vmin, idx.vdiff)).as("fused"),
          aggregate(zip_with(col("qvec").cast("array<double>"),
            org.apache.spark.sql.graft.shim.col(graft.index.SqVariant.decode(qtype,
              org.apache.spark.sql.graft.shim.expr(col("code")),
              idx.vmin, idx.vdiff)).cast("array<double>"),
            (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x).as("viaDecode"))
      df.collect().foreach { r =>
        assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6,
          s"$qtype: ${r.getDouble(0)} vs ${r.getDouble(1)}")
      }
    }
  }

  test("recall ordering across widths: fp16 >= SQ8 >= SQ6 >= SQ4 (with slack)") {
    val truth = Knn.knnJoin(q, b, 10).cache()
    val rec = Seq("SQ4", "SQ6", "SQ8", "fp16").map { t =>
      t -> Recall.mean(truth, SqIndex.build(b, "id", "vec", qtype = t).search(q, 10))
    }.toMap
    assert(rec("fp16") > 0.95, s"fp16 recall ${rec("fp16")}")
    assert(rec("SQ8") >= rec("SQ6") - 0.05, s"$rec")
    assert(rec("SQ6") >= rec("SQ4") - 0.05, s"$rec")
    assert(rec("SQ4") > 0.5, s"SQ4 recall ${rec("SQ4")}")
    truth.unpersist()
  }

  test("IVF variants of each width search and factory tokens parse") {
    for (tok <- Seq("IVF4,SQ4", "IVF4,SQ6", "IVF4,SQfp16", "SQ4", "SQ6", "SQfp16")) {
      val built = IndexFactory.build(b, "id", "vec", tok, niter = 2)
      assert(built.search(q, 5, nprobe = 4).count() == 50, tok)
    }
  }

  test("factory IVF,SQ8 is the reference's by_residual=true form") {
    // IndexScalarQuantizer.h:74: encode_residual defaults true — the
    // factory must build the residual-trained range, matching a
    // direct byResidual=true build exactly at the same seeds
    val built = IndexFactory.build(b, "id", "vec", "IVF4,SQ8", niter = 2)
    val direct = IvfSqIndex.build(b, "id", "vec", nlist = 4, niter = 2,
      byResidual = true)
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(res(built.search(q, 5, nprobe = 4)) == res(direct.search(q, 5, nprobe = 4)))
    // ...and differs from the non-residual range on this data (the
    // two forms are genuinely different codecs)
    val plain = IvfSqIndex.build(b, "id", "vec", nlist = 4, niter = 2)
    assert(direct.vmin.toSeq != plain.vmin.toSeq)
  }
}
