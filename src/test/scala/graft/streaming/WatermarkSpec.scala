package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Event-time semantics the reference lacks entirely (SURVEY §2.10):
  * watermarked tumbling windows with late-data drop, exercised
  * synchronously over a MemoryStream. */
class WatermarkSpec extends SparkTestBase {

  test("watermark drops events later than the threshold in append mode") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Timestamp, Double)]
    val agg = ms.toDF().select(col("_1").as("ts"), col("_2").as("v"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
    val name = "graft_watermark_test"
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    try {
      ms.addData((ts(1, 10), 1.0), (ts(1, 20), 2.0))
      q.processAllAvailable()
      // advance event time far past hour 1 + watermark -> hour-1 window closes
      ms.addData((ts(3, 0), 3.0))
      q.processAllAvailable()
      // this event is now >10min late for the closed hour-1 window: dropped
      ms.addData((ts(1, 30), 99.0))
      q.processAllAvailable()
      ms.addData((ts(5, 0), 4.0))
      q.processAllAvailable()
      val rows = spark.table(name)
        .select(col("window.start").cast("string"), col("cnt")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // hour-1 window emitted with ONLY the 2 on-time events
      assert(rows.exists { case (k, v) => k.startsWith("2024-01-01 01") && v == 2L },
        s"got $rows")
    } finally q.stop()
  }

  test("session window closing EXACTLY at the watermark is emitted (<= eviction," +
    " the comparator the batch oracle replays)") {
    // ADVICE r8: stream_session_window's oracle parity at an
    // exact-equality session end (last_ts + gap == watermark) rode on
    // an assumption about Spark's append-mode eviction comparator that
    // the testdata never exercised. Pin it: user 1's single event at
    // 00:00 with a 10-minute gap ends its session at 00:10; user 2's
    // event at exactly 00:10 drives the watermark (delay 0s) to 00:10.
    // The no-data batch after the drain must emit user 1's session
    // (end <= watermark) and must NOT emit user 2's (end 00:20 > wm) —
    // the same `last + gap <= max(ts)` cutoff the DuckDB oracle uses.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Timestamp, Long)]
    val agg = ms.toDF().select(col("_1").as("ts"), col("_2").as("user_id"))
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), "10 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val name = "graft_session_boundary_test"
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      ms.addData((Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
        (Timestamp.valueOf("2024-01-01 00:10:00"), 2L))
      q.processAllAvailable()
      val users = spark.table(name).select("user_id").collect()
        .map(_.getLong(0)).toSet
      assert(users == Set(1L),
        s"expected exactly user 1's boundary session emitted, got $users")
    } finally q.stop()
  }

  test("RocksDB state-store toggle: dedup result is batch-distinct, the " +
    "provider actually engages, and the session conf is restored " +
    "(VERDICT r18 #6: the off-heap space bound of the 100 TB contract)") {
    val events = s"$sf0001/events.parquet"
    val keys = Seq("user_id", "event_type")
    // capture streaming progress to prove the RocksDB provider RAN —
    // its state operators publish rocksdb* custom metrics the default
    // HDFS-backed provider never emits
    val sawRocks = new java.util.concurrent.atomic.AtomicBoolean(false)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        import scala.jdk.CollectionConverters._
        if (e.progress.stateOperators.exists(
            _.customMetrics.keySet.asScala.exists(_.contains("rocksdb"))))
          sawRocks.set(true)
      }
    }
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    spark.streams.addListener(listener)
    try {
      val got = graft.streaming.StreamingIngest.dedupIngestWithinWatermark(
        spark, events, keys, rocksDb = true)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = spark.read.parquet(events)
        .select(col("user_id"), col("event_type")).distinct()
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"rocksdb dedup != batch distinct: $got vs $want")
      // listener delivery is async — poll briefly
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!sawRocks.get && System.nanoTime() < deadline) Thread.sleep(100)
      assert(sawRocks.get,
        "no streaming progress reported rocksdb state-store metrics — " +
          "the toggle did not engage the RocksDB provider")
      assert(spark.conf.getOption(key) == before,
        "state-store provider conf leaked out of the toggled query")
    } finally spark.streams.removeListener(listener)
  }
}
