package graft.misc

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The sf1-equivalent bench tier (SPARK_GRAFT_SCALE_X) must never be
  * able to change an oracle run: every replication hook is the
  * IDENTITY at scaleX = 1, and at scaleX > 1 the planted near-dup
  * structure replicates linearly (per copy) instead of collapsing
  * into a quadratic cross-copy clique. Pins the contract of
  * Queries.replicatePairGroups, the shared fixture expander behind
  * doubledEmb / embedding_near_dup / knn_graph_nndescent. */
class ScaleXSpec extends SparkTestBase {

  private def doubled = {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    e.unionByName(
      e.select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
  }

  private val cos = {
    val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  test("replicatePairGroups is the identity (same reference) at sx <= 1") {
    val df = doubled
    assert(graft.Queries.replicatePairGroups(df, "vec_id", "embedding", 1) eq df)
    assert(graft.Queries.replicatePairGroups(df, "vec_id", "embedding", 0) eq df)
  }

  test("sx = 3 triples the corpus and copy 0 is bit-identical to the input") {
    val df = doubled.cache()
    val r = graft.Queries
      .replicatePairGroups(df, "vec_id", "embedding", 3).cache()
    assert(r.count() == 3 * df.count())
    val copy0 = r.filter(col("vec_id") < (1L << 40))
      .collect().map(x => (x.getLong(0), x.getSeq[Float](1))).sortBy(_._1)
    val base = df.collect()
      .map(x => (x.getLong(0), x.getSeq[Float](1))).sortBy(_._1)
    assert(copy0.sameElements(base))
  }

  test("planted dup pairs stay exact within every copy; cross-copy cosine < 0.95") {
    val r = graft.Queries
      .replicatePairGroups(doubled, "vec_id", "embedding", 3).cache()
    // the planted pair (g, g + 10000) shares a pair group, so both
    // members receive identical noise in every copy k
    val lo = r.filter(col("vec_id") % lit(1L << 40) < 10000)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding").as("a"))
    val pairBroken = lo.join(r.select(col("vec_id"), col("embedding").as("b")), "vec_id")
      .filter(not(col("a") === col("b"))).count()
    assert(pairBroken == 0L)
    // the same base vector across copies must land BELOW the 0.95
    // near-dup threshold (linear, not quadratic, pair replication).
    // The noise is orthogonal to v with |delta| = 0.4||v|| EXACTLY,
    // so copy0-vs-copyk cosine is the deterministic
    // 1/sqrt(1.16) = 0.92848 — no distributional tail to get lucky
    // or unlucky with; two noisy copies land lower still.
    val byCopy = r.select(pmod(col("vec_id"), lit(1L << 40)).as("g"),
      (col("vec_id") / lit(1L << 40)).cast("long").as("k"), col("embedding"))
    val cross = byCopy.as("x")
      .join(byCopy.as("y"), col("x.g") === col("y.g") && col("x.k") < col("y.k"))
      .select(col("x.k").as("k"), cos(col("x.embedding"), col("y.embedding")).as("c"))
      .cache()
    val maxCross = cross.agg(max(col("c"))).head().getDouble(0)
    assert(maxCross < 0.95, s"cross-copy cosine $maxCross collapses the pair structure")
    val c0k = cross.filter(col("k") === 0)
      .agg(min(col("c")), max(col("c"))).head()
    assert(math.abs(c0k.getDouble(0) - 0.92848) < 2e-3 &&
      math.abs(c0k.getDouble(1) - 0.92848) < 2e-3,
      s"copy0-vs-copyk cosine should be the deterministic 0.92848, got $c0k")
  }
}
