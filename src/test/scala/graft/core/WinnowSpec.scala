package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim

/** Winnowing fingerprints (Schleimer et al. SIGMOD'03). */
class WinnowSpec extends SparkTestBase {

  private def fps(texts: Seq[(Long, String)], k: Int = 8, w: Int = 4) = {
    val s = spark
    import s.implicits._
    texts.toDF("id", "text")
      .select(col("id"), explode(shim.col(WinnowFingerprints(
        shim.expr(col("text")), k, w))).as("_f"))
      .select(col("id"), col("_f.pos"), col("_f.fp"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
  }

  test("matches of length >= k + w - 1 share at least one fingerprint") {
    val shared = "the quick brown fox jumps"
    val a = s"AAAA $shared BBBB padding here"
    val b = s"ZZZZZZZZ $shared YYYY other tail"
    val out = fps(Seq((1L, a), (2L, b)))
    val fa = out.filter(_._1 == 1L).map(_._3).toSet
    val fb = out.filter(_._1 == 2L).map(_._3).toSet
    assert((fa & fb).nonEmpty, s"no shared fingerprint: $fa vs $fb")
  }

  test("disjoint alphabets share nothing; short docs yield no fingerprints") {
    val out = fps(Seq((1L, "abcdefghijabcdefghij"), (2L, "QRSTUVWXYZQRSTUVWXYZ"),
      (3L, "tiny")))
    val fa = out.filter(_._1 == 1L).map(_._3).toSet
    val fb = out.filter(_._1 == 2L).map(_._3).toSet
    assert((fa & fb).isEmpty)
    assert(!out.exists(_._1 == 3L))
  }

  test("density: roughly 2/(w+1) of windows selected, positions strictly informative") {
    val text = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 4)
    val out = fps(Seq((1L, text)))
    val numH = text.length - 8 + 1
    // winnowing expected density 2/(w+1) = 0.4; repeated text lowers it
    assert(out.length > numH / 20 && out.length < numH,
      s"${out.length} fingerprints from $numH hashes")
    // every selected pos indexes a real window (1-based)
    assert(out.forall(f => f._2 >= 1 && f._2 <= numH))
  }
}
