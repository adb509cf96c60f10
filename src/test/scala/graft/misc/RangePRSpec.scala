package graft.misc

import graft.SparkTestBase
import graft.eval.Recall
import org.apache.spark.sql.functions._

/** range_PR semantics (contrib/evaluation.py:38-130) — the count
  * table, both modes, and the empty-set conventions of counts_to_PR. */
class RangePRSpec extends SparkTestBase {

  import spark.implicits._

  test("range_PR counts and both modes reproduce counts_to_PR") {
    // q0: gt {1,2,3}, found {2,3,4}   -> ninter 2, P 2/3, R 2/3
    // q1: gt {5},     found {}        -> ninter 0, P 1 (no results), R 0
    // q2: gt {},      found {7}       -> ninter 0, P 0, R 0 (spurious)
    // q3: gt {},      found {}        -> P 1, R 1 (both empty)
    val truth = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 5L)).toDF("qid", "id")
    val approx = Seq((0L, 2L), (0L, 3L), (0L, 4L), (2L, 7L)).toDF("qid", "id")
    val queries = Seq(0L, 1L, 2L, 3L).toDF("qid")
    val c = Recall.rangePRCounts(truth, approx, queries)
    val rows = c.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows(0L) == ((3L, 3L, 2L)))
    assert(rows(1L) == ((1L, 0L, 0L)))
    assert(rows(2L) == ((0L, 1L, 0L)))
    assert(rows(3L) == ((0L, 0L, 0L)))
    // overall: P = 2/4, R = 2/4
    val ov = Recall.rangePR(c, "overall").collect().head
    assert(math.abs(ov.getDouble(0) - 0.5) < 1e-12)
    assert(math.abs(ov.getDouble(1) - 0.5) < 1e-12)
    // average: P = (2/3 + 1 + 0 + 1)/4, R = (2/3 + 0 + 0 + 1)/4
    val av = Recall.rangePR(c, "average").collect().head
    assert(math.abs(av.getDouble(0) - (2.0 / 3 + 2) / 4) < 1e-12)
    assert(math.abs(av.getDouble(1) - (2.0 / 3 + 1) / 4) < 1e-12)
  }

  test("identical result sets give P = R = 1 in both modes") {
    val t = Seq((0L, 1L), (1L, 2L)).toDF("qid", "id")
    val qs = Seq(0L, 1L).toDF("qid")
    for (m <- Seq("overall", "average")) {
      val r = Recall.rangePR(Recall.rangePRCounts(t, t, qs), m).collect().head
      assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 1.0, m)
    }
  }

  test("IVF range search vs exact scan: precision 1, recall <= 1") {
    // an IVF radius scan returns exact distances over a candidate
    // SUBSET, so vs the exact scan at the same radius precision must
    // be exactly 1 and recall at nprobe < nlist at most 1
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val b = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val idx = graft.index.IvfIndex.build(b, "id", "vec", nlist = 8, niter = 3)
    val truth = graft.knn.Knn.rangeJoin(q, b, 2.0)
    val approx = idx.rangeSearch(q, 2.0, nprobe = 2)
    val r = Recall.rangePR(Recall.rangePRCounts(truth, approx, q), "overall")
      .collect().head
    assert(r.getDouble(0) == 1.0, "IVF candidates carry exact distances")
    assert(r.getDouble(1) <= 1.0 && r.getDouble(1) > 0.0)
  }
}
