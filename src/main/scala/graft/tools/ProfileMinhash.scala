package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level wall-clock attribution for the at-scale MinHash dedup
  * pipeline (the one bench query near the 2x oracle gate). Times each
  * stage of the `minhash_neardup_big` chain in isolation so the hot
  * spot is measurable instead of guessed. Run:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ProfileMinhash /root/testdata/sf0.1"
  */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.llm.Dedup

    def time[T](label: String)(f: => T): T = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // THE catalog's corpus derivation — shared with the bench-gated
    // query so the profiled stages can never desynchronize from it
    val corpus = graft.Queries.commentCorpus(spark, dir)
    time("corpus derive+persist") { corpus.count() }

    // the stages of Dedup.nearDupPairs, timed individually
    val banded = time("band table (sig+bands)") {
      val b = Dedup.bandTable(corpus, "doc_id", "text", 3, 12, 4)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      b.count(); b
    }
    val cand = time("candidate self-join") {
      val c = Dedup.candidatesFrom(banded)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      System.err.println(s"[profile]   candidates: ${c.count()}")
      c
    }
    val sets = time("shingle sets") {
      val s = corpus.select(col("doc_id").as("_id"),
        graft.llm.TextFunctions.shingleSet(col("text"), 3).as("_set"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    time("exact-Jaccard verify") {
      val out = Dedup.pairJaccardWith(cand, sets)
        .filter(col("jaccard") >= 0.8)
      System.err.println(s"[profile]   verified pairs: ${out.count()}")
    }
    spark.stop()
  }
}
