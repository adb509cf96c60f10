package graft.index

import graft.SparkTestBase
import graft.knn.Knn
import org.apache.spark.sql.functions._

/** IMI multi-index: probing every cell must reproduce the exact scan,
  * and the cartesian cell id must round-trip the two half
  * assignments. */
class ImiSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private def q = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
  private def b = emb.filter(col("vec_id") >= 5)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("nprobe = nlist reproduces the exact flat search") {
    val idx = ImiIndex.build(b, "id", "vec", ksub = 4, niter = 3)
    val got = idx.search(q, k = 5, nprobe = idx.nlist)
      .select("qid", "rank", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Knn.knnJoin(q, b, 5)
      .select("qid", "rank", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("MIQ2 search2 (per-half sub-index top-k2 + MinSumK) == search (r9)") {
    // MultiIndexQuantizer2 (IndexPQ.h:171): the two-level cell ranking
    // must select the same probe cells as the K² enumeration — min-sum
    // over per-half top-k2 is exhaustive for any final rank <= k2
    val idx = ImiIndex.build(b, "id", "vec", ksub = 4, niter = 3)
    for (np <- Seq(1, 3, idx.nlist)) {
      val got = idx.search2(q, k = 5, nprobe = np)
        .select("qid", "rank", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = idx.search(q, k = 5, nprobe = np)
        .select("qid", "rank", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"nprobe=$np")
    }
  }

  test("cells cover 0 until K*K and partition the base") {
    val idx = ImiIndex.build(b, "id", "vec", ksub = 4, niter = 3)
    val cells = idx.invlists.select("cell").collect().map(_.getInt(0))
    assert(cells.forall(c => c >= 0 && c < 16))
    assert(idx.invlists.count() == b.count())
  }

  test("factory string IMI2x2,Flat builds and searches") {
    val built = IndexFactory.build(b, "id", "vec", "IMI2x2,Flat", niter = 3)
    val res = built.search(q, k = 3, nprobe = 16) // 2^2 squared = all cells
    val got = res.select("qid", "rank", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Knn.knnJoin(q, b, 3).select("qid", "rank", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("fewer probes scan fewer candidates but stay a subset ranking") {
    val idx = ImiIndex.build(b, "id", "vec", ksub = 4, niter = 3)
    val exact = idx.search(q, k = 3, nprobe = idx.nlist)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pruned = idx.search(q, k = 3, nprobe = 4)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // approximate: pruned results are real rows, mostly overlapping
    assert(pruned.nonEmpty)
    assert((exact intersect pruned).size >= pruned.size / 2)
  }
}
