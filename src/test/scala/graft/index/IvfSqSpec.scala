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
}
