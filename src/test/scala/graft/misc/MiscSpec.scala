package graft.misc

import graft.SparkTestBase
import graft.cluster.{KMeans, KMeans1D}
import graft.streaming.StreamingIngest
import graft.tune.AutoTune
import graft.index.IvfIndex
import org.apache.spark.sql.functions._

class MiscSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  test("kmeans1d exact DP matches brute force on tiny input") {
    val hist = Array((0.0, 1L), (0.1, 1L), (0.2, 1L), (5.0, 1L), (5.1, 1L), (9.0, 1L))
    val r = KMeans1D.fitHistogram(hist, 3)
    // brute force over all 2-cut positions
    def sse(xs: Seq[Double]) = {
      val m = xs.sum / xs.size; xs.map(x => (x - m) * (x - m)).sum
    }
    val vals = hist.map(_._1).toSeq
    val best = (for {
      c1 <- 1 until 5; c2 <- (c1 + 1) until 6
    } yield sse(vals.slice(0, c1)) + sse(vals.slice(c1, c2)) + sse(vals.slice(c2, 6))).min
    assert(math.abs(r.objective - best) < 1e-9)
    assert(r.centroids.length == 3 && r.boundaries.head == 0.0)
  }

  test("kmeans1d on lineitem quantity is deterministic and ordered") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val r = KMeans1D.fit(li, "l_quantity", 4)
    assert(r.centroids.sliding(2).forall { case Array(a, b) => a < b })
  }

  test("streaming ingest appends into a searchable IVF layout") {
    val data = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val model = KMeans.fit(data, "vec", KMeans.Params(k = 4, niter = 3))
    val dir = java.nio.file.Files.createTempDirectory("ingest").toString
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Long, Seq[Float])]
    val stream = ms.toDF().select(col("_1").as("id"),
      col("_2").cast("array<float>").as("vec"))
    val rows = data.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val q = StreamingIngest.startIngest(stream, model, dir,
      java.nio.file.Files.createTempDirectory("ckpt").toString)
    try {
      ms.addData(rows.take(250).toSeq)
      q.processAllAvailable()
      ms.addData(rows.drop(250).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val written = spark.read.parquet(s"$dir/invlists")
    assert(written.count() == 500)
    assert(written.select("list_no").distinct().count() <= 4)
  }

  test("sliding window retention keeps newest partitions") {
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("day", "v")
    val kept = StreamingIngest.slidingWindow(df, "day", 2)
    assert(kept.select("day").collect().map(_.getInt(0)).sorted.toSeq == Seq(3, 4))
  }

  test("autotune: recall nondecreasing in nprobe; pareto front is minimal") {
    val b = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val idx = IvfIndex.build(b, "id", "vec", nlist = 8, niter = 3)
    val pts = AutoTune.explore(idx, q, b, 10, Seq(1, 2, 4, 8))
    assert(pts.map(_.recall).sliding(2).forall { case Seq(a, c) => c >= a - 1e-9 })
    assert(pts.last.recall > 0.99) // nprobe = nlist is exact
    val front = AutoTune.paretoFront(pts)
    assert(front.nonEmpty && front.size <= pts.size)
  }
}
