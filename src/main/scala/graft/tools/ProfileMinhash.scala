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
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // mirror Bench's aggregate fallback + codegen cache so profiled
      // stages run under the SAME session posture as the bench cells
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4194304")
    // honor the scaling tier's conf overrides (partition scaling etc.)
    // exactly as Bench does — the r18 minhash investigation found the
    // profiler silently running 32-way while the tier ran 320-way
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); b.config(k, v) })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.llm.Dedup

    // per-stage executor CPU + shuffle bytes (steal-immune): wall alone
    // cannot separate a super-linear plan term from box contention
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val shufB = new java.util.concurrent.atomic.AtomicLong
    val spillB = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          cpuNs.addAndGet(m.executorCpuTime)
          shufB.addAndGet(m.shuffleReadMetrics.totalBytesRead +
            m.shuffleWriteMetrics.bytesWritten)
          spillB.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        }
      }
    })
    def time[T](label: String)(f: => T): T = {
      System.gc()
      val (c0, s0, p0) = (cpuNs.get, shufB.get, spillB.get)
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  cpu ${(cpuNs.get - c0) / 1e9}%8.2f s  shuffle ${(shufB.get - s0) >> 20}%6d MB" +
        f"  spill ${(spillB.get - p0) >> 20}%6d MB")
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
    // bucket-size distribution: the LSH collision tail IS sum over
    // buckets of C(size, 2) — if candidate pairs grow super-linearly
    // with the corpus, this histogram names the term (VERDICT r17 #2)
    time("bucket histogram") {
      val h = banded.groupBy(col("band_id"), col("band_hash"))
        .agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_buckets"),
          max(col("sz")).as("max_sz"),
          expr("percentile_approx(sz, 0.999)").as("p999_sz"),
          sum(col("sz") * (col("sz") - 1) / 2).as("pair_expansions"),
          sum(when(col("sz") >= 2, 1).otherwise(0)).as("buckets_ge2"))
        .collect()(0)
      System.err.println(s"[profile]   buckets=${h.get(0)} max_sz=${h.get(1)} " +
        s"p999_sz=${h.get(2)} pair_expansions=${h.get(3)} buckets_ge2=${h.get(4)}")
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
    time("verify (string array_intersect)") {
      val out = Dedup.pairJaccardWith(cand, sets)
        .filter(col("jaccard") >= 0.8)
      System.err.println(s"[profile]   verified pairs: ${out.count()}")
    }
    // the OPERATOR's verify form (nearDupPairs): sorted distinct 60-bit
    // long hashes + merge-pass intersect kernel
    val hsets = time("long-hash sets") {
      val s = corpus.select(col("doc_id").as("_id"),
        graft.llm.TextFunctions.minhashBandsAndHashSet(col("text"), 3, 12, 4)
          .getField("sh").as("_set"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    time("verify (sorted-long kernel)") {
      import org.apache.spark.sql.graft.shim
      val inter = shim.col(graft.core.SortedLongIntersectK(
        shim.expr(col("_sa")), shim.expr(col("_sb")))).cast("double")
      val out = cand
        .join(hsets.select(col("_id").as("i"), col("_set").as("_sa")), "i")
        .join(hsets.select(col("_id").as("j"), col("_set").as("_sb")), "j")
        .withColumn("_inter", inter)
        .withColumn("_union",
          (size(col("_sa")) + size(col("_sb"))).cast("double") - col("_inter"))
        .withColumn("jaccard",
          when(col("_union") > 0, col("_inter") / col("_union")).otherwise(0.0))
        .filter(col("jaccard") >= 0.8)
      System.err.println(s"[profile]   verified pairs: ${out.count()}")
      System.err.println(out.queryExecution.executedPlan.toString.take(4000))
    }
    // the ACTUAL operator, end-to-end (fused single-pass signature +
    // candidate join + kernel verify, all materialized through one
    // count) — the bench cell measures THIS, so any gap between the
    // stage sum above and this number is plan/materialization overhead
    // (cache-population races, persist copies), not kernel work
    time("OPERATOR nearDupPairs e2e") {
      val out = Dedup.nearDupPairs(corpus, "doc_id", "text", 0.8, 3, 12, 4)
      System.err.println(s"[profile]   operator pairs: ${out.count()}")
      Dedup.release(out)
    }
    spark.stop()
  }
}
