package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Manual perf probe (not part of correctness): prints stage timings
  * for the minhash pipeline at sf0.1. Run with
  * `sbt "Test/testOnly graft.llm.DedupPerfProbe"`. */
class DedupPerfProbe extends SparkTestBase {
  test("stage timings at sf0.1") {
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    t("tokenize+shingleSet") {
      docs.select(size(TextFunctions.shingleSet(col("text"), 3))).agg(sum("*")).collect()
    }
    t("base md5 hashes") {
      docs.select(transform(TextFunctions.shingleSet(col("text"), 3),
        s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))).count()
    }
    t("full signature") {
      docs.select(TextFunctions.minhashSignature(
        TextFunctions.shingleSet(col("text"), 3), 12)).count()
    }
    val cand = t("candidates") {
      val c = Dedup.minhashLshCandidates(docs, "doc_id", "text", 3, 12, 4)
      c.count(); c
    }
    t("pairJaccard") {
      Dedup.pairJaccard(cand, docs, "doc_id", "text", 3).count()
    }
  }
}
