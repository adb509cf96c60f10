package graft.knn

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Per-partition NSG accelerator (faiss/IndexNSG.h:26 capability) and
  * the NNDescent-as-index mode (faiss/IndexNNDescent.h:23): LocalNsg
  * invariants on synthetic data plus recall of the sharded search
  * against the exact path. */
class NsgSpec extends SparkTestBase {

  private def mk(n: Int, d: Int, seed: Int): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(Array.fill(d)(rnd.nextFloat()))
  }

  private def exactTopk(pts: Array[Array[Float]], q: Array[Float], k: Int): Seq[Long] =
    pts.zipWithIndex.map { case (v, i) =>
      val dd = v.zip(q).map { case (a, b) => (a.toDouble - b) * (a.toDouble - b) }.sum
      (dd, i.toLong)
    }.sortBy(t => (t._1, t._2)).take(k).map(_._2).toSeq

  test("LocalNsg: exact when searchL >= n (full pool degenerate)") {
    val pts = mk(300, 8, 7)
    val g = new LocalNsg(Array.tabulate(300)(_.toLong), pts, gk = 16, r = 16, buildL = 32)
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 5) {
      val q = Array.fill(8)(rnd.nextFloat())
      val got = g.search(q, 5, searchL = 300).map(_._1).toSeq
      assert(got == exactTopk(pts, q, 5), "degenerate search must equal brute force")
    }
  }

  test("LocalNsg: degree bound R holds after reverse links + tree_grow") {
    val pts = mk(500, 8, 3)
    val g = new LocalNsg(Array.tabulate(500)(_.toLong), pts, gk = 24, r = 12, buildL = 48)
    assert(g.maxDegree <= 12, s"maxDegree ${g.maxDegree} > R=12")
  }

  test("LocalNsg: recall@10 >= 0.9 at searchL=64 on 3k vectors (HNSW-bootstrap path)") {
    val pts = mk(3000, 16, 9)  // n > 2048 exercises the bootstrap branch
    val g = new LocalNsg(Array.tabulate(3000)(_.toLong), pts, gk = 32, r = 32, buildL = 64)
    val rnd = new scala.util.Random(21)
    var hit = 0; var tot = 0
    for (_ <- 0 until 20) {
      val q = Array.fill(16)(rnd.nextFloat())
      val want = exactTopk(pts, q, 10).toSet
      val got = g.search(q, 10, searchL = 64).map(_._1).toSet
      hit += (want intersect got).size; tot += want.size
    }
    val recall = hit.toDouble / tot
    assert(recall >= 0.9, s"recall $recall < 0.9")
  }

  test("LocalNsg: unpruned (NNDescent-as-index) search reaches recall >= 0.8") {
    val pts = mk(1500, 12, 17)
    val g = new LocalNsg(Array.tabulate(1500)(_.toLong), pts,
      gk = 24, r = 24, buildL = 48, prune = false)
    val rnd = new scala.util.Random(23)
    var hit = 0; var tot = 0
    for (_ <- 0 until 20) {
      val q = Array.fill(12)(rnd.nextFloat())
      val want = exactTopk(pts, q, 10).toSet
      val got = g.search(q, 10, searchL = 64).map(_._1).toSet
      hit += (want intersect got).size; tot += want.size
    }
    val recall = hit.toDouble / tot
    assert(recall >= 0.8, s"recall $recall < 0.8")
  }

  test("PartitionedNsg: recall@10 >= 0.9 vs exact on 10k vectors") {
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
    val approx = PartitionedNsg
      .knnJoin(queries, base, 10, gk = 32, r = 32, buildL = 64, searchL = 96)
      .select("qid", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    base.unpersist()
    assert(recall >= 0.9, s"recall $recall < 0.9")
  }

  test("PartitionedNsg: deterministic across runs on a fixed partitioning") {
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
    def run() = PartitionedNsg.knnJoin(queries, base, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = run(); val b = run()
    base.unpersist()
    assert(a == b, "same partitioning must give identical results")
  }
}
