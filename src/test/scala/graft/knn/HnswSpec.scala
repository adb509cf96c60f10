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
}
