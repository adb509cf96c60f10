package graft.knn

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class KnnGraphSpec extends SparkTestBase {

  private lazy val base = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .limit(200)
    .select(col("vec_id").as("id"), col("embedding").as("vec")).cache()

  private def edges(df: org.apache.spark.sql.DataFrame) =
    df.select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact graph: k edges per node, no self edges, blocked == unblocked") {
    val g = KnnGraph.exact(base, 5)
    assert(g.count() == 200 * 5)
    assert(g.filter(col("src") === col("dst")).count() == 0)
    assert(edges(KnnGraph.exact(base, 5, blocks = 3)) == edges(g))
  }

  test("nn-descent converges toward the exact graph") {
    val truth = edges(KnnGraph.exact(base, 5))
    def recall(iters: Int): Double = {
      val g = edges(KnnGraph.nnDescent(base, 5, iters = iters))
      truth.intersect(g).size.toDouble / truth.size
    }
    val r1 = recall(1)
    val r3 = recall(3)
    assert(r3 >= r1 - 0.02, s"recall did not improve: $r1 -> $r3")
    assert(r3 > 0.5, s"nn-descent recall after 3 iters: $r3")
  }
}
