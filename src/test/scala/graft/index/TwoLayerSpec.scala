package graft.index

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Index2Layer: coarse centroid + PQ residual storage
  * (faiss/Index2Layer.h:29). Reconstruction must beat coarse-only
  * reconstruction (the PQ refines the residual) and round-trip
  * deterministically. */
class TwoLayerSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private def data = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))

  private def sse(recon: org.apache.spark.sql.DataFrame): Double =
    recon.join(data, "id")
      .select(aggregate(
        zip_with(col("vec").cast("array<double>"),
          col("rv").cast("array<double>"),
          (x, y) => (x - y) * (x - y)),
        lit(0.0), (a, x) => a + x).as("e"))
      .agg(sum(col("e"))).first().getDouble(0)

  test("PQ residual reconstruction beats coarse-only reconstruction") {
    val idx = TwoLayerIndex.build(data, "id", "vec",
      nlist = 8, m = 8, ksub = 16, niterCoarse = 3, niterPq = 3)
    val full = sse(idx.reconstruct.select(col("id"), col("vec").as("rv")))
    // coarse-only: centroid of the assigned list
    val s = spark
    import s.implicits._
    val centDf = idx.centroids.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }.toDF("list_no", "_c")
      .select(col("list_no"), col("_c").cast("array<float>").as("rv"))
    val coarse = sse(idx.codes.join(broadcast(centDf), "list_no").select(col("id"), col("rv")))
    assert(full < coarse, s"2-layer sse $full !< coarse sse $coarse")
  }

  test("reconstruction is deterministic across builds") {
    def run() = {
      val idx = TwoLayerIndex.build(data, "id", "vec",
        nlist = 8, m = 8, ksub = 16, niterCoarse = 3, niterPq = 3)
      idx.reconstruct.select(col("id"),
        round(element_at(col("vec"), 1).cast("double"), 5).as("v"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    }
    assert(run() == run())
  }

  test("factory string Residual8,PQ8 builds and searches k rows per query") {
    val built = IndexFactory.build(data, "id", "vec", "Residual8,PQ8", niter = 3)
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val res = built.search(q, k = 4)
    assert(res.groupBy("qid").count().collect().forall(_.getLong(1) == 4))
    assert(IndexFactory.codeSize("Residual8,PQ8", 64) == 8)
  }
}
