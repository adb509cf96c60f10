package graft.index

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Concurrency regression for the shared coarse-quantizer graphs:
  * one LocalHnsw/LocalNsg instance serves parallel searches through
  * the executor-side caches, so the beam/pool scratch must be
  * per-thread (round-11 finding: per-instance scratch corrupted
  * probe sets under concurrent tasks). */
class GraphCoarseConcurrencySpec extends SparkTestBase {

  test("shared graph coarse is exact under concurrent query partitions") {
    val rng = new scala.util.Random(11)
    val d = 8
    val cents = Array.fill(64)(Array.fill(d)(rng.nextFloat() * 0.1f))
    val qs = (0 until 256).map(i => (i.toLong, Array.fill(d)(rng.nextFloat() * 0.1f).toSeq))
    import spark.implicits._
    // many partitions -> concurrent tasks share one cached graph
    val qdf = qs.toDF("qid", "qvec").repartition(16)
      .select(col("qid"), col("qvec").cast("array<float>").as("qvec"))
    import org.apache.spark.sql.graft.shim
    def run(c: org.apache.spark.sql.Column) =
      qdf.select(col("qid"), explode(c).as("p"))
        .select(col("qid"), col("p.list_no"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val exact = run(shim.col(graft.core.NearestCentroids(shim.expr(col("qvec")), cents, 8, "l2sq")))
    val viaH = run(shim.col(graft.core.NearestCentroidsHnsw(shim.expr(col("qvec")), cents, 8, 4096, 32, "conc-h")))
    assert(viaH == exact, s"hnsw missing=${(exact -- viaH).take(5)} extra=${(viaH -- exact).take(5)}")
    val viaN = run(shim.col(graft.core.NearestCentroidsNsg(shim.expr(col("qvec")), cents, 8, 4096, 32, "conc-n")))
    assert(viaN == exact, s"nsg missing=${(exact -- viaN).take(5)} extra=${(viaN -- exact).take(5)}")
  }

  test("big twin: exact vs hnsw coarse end to end") {
    val dir = "/root/testdata/sf0.01"
    def rows(name: String) = graft.SparkEntry.queries(name)(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows("ivf_hnsw_pq_search_big") == rows("ivfpq_search_big"))
  }
}
