package graft.index

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** IndexIVFSpectralHash: periodic-threshold binary signatures ranked
  * by Hamming inside probed lists (faiss/IndexIVFSpectralHash.h:31,
  * cpp:146-160 binarize_with_freq). */
class IvfSpectralHashSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private def data = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("a base point queried against the index finds itself at Hamming 0") {
    val idx = IvfSpectralHash.build(data, "id", "vec",
      nlist = 4, nbit = 32, period = 1.0, thresholdType = "median", niter = 3)
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    // nprobe = nlist: the home list is always probed, and the query's
    // signature in that list equals the stored one -> hamming 0
    val top = idx.search(q, k = 1, nprobe = 4)
      .select("qid", "hamming").collect()
    assert(top.length == 10)
    assert(top.forall(_.getLong(1) == 0L),
      s"self-hamming nonzero: ${top.mkString(",")}")
  }

  test("signatures are deterministic and sensitive to the period") {
    def codes(period: Double) = IvfSpectralHash.build(data, "id", "vec",
      nlist = 4, nbit = 32, period = period, thresholdType = "global", niter = 3)
      .codes.select("id", "sig").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val a = codes(1.0); val b = codes(1.0); val c = codes(0.25)
    assert(a == b)
    assert(a != c, "period change should alter at least one signature")
  }

  test("every threshold type trains and searches") {
    for (tt <- Seq("global", "centroid", "centroid_half", "median")) {
      val idx = IvfSpectralHash.build(data, "id", "vec",
        nlist = 4, nbit = 16, period = 2.0, thresholdType = tt, niter = 2)
      val q = emb.filter(col("vec_id") < 2)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      assert(idx.search(q, k = 3, nprobe = 4).count() == 6)
    }
  }

  test("centroid_half thresholds = float(centroid threshold) - period/4 " +
    "(IndexIVFSpectralHash.cpp:86-90)") {
    def built(tt: String) = IvfSpectralHash.build(data, "id", "vec",
      nlist = 4, nbit = 16, period = 2.0, thresholdType = tt, niter = 2)
    val c = built("centroid"); val ch = built("centroid_half")
    // same seeds, same data: coarse + rotation identical, only the
    // -period/4 shift separates the trained thresholds (applied to the
    // float-rounded transform output, as the reference subtracts from
    // trained[] AFTER vt->apply rounds to float)
    for (l <- 0 until 4; j <- 0 until 16)
      assert(ch.thresholds(l)(j) ==
        (c.thresholds(l)(j).toDouble - 0.25 * 2.0).toFloat,
        s"list $l bit $j: ${ch.thresholds(l)(j)} vs ${c.thresholds(l)(j)}")
  }

  test("factory string IVF4,SH16x2.0m builds; codeSize is nbit/8") {
    val built = IndexFactory.build(data, "id", "vec", "IVF4,SH16x2.0m", niter = 2)
    val q = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    assert(built.search(q, k = 2, nprobe = 4).count() == 4)
    assert(IndexFactory.codeSize("IVF4,SH16x2.0m", 64) == 2)
  }
}
