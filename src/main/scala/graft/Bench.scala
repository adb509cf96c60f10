package graft
import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Uncounted warmup: pays one-time session/scheduler/codegen startup
    // so per-query timings measure the queries, not JVM init.
    try SparkEntry.queries.headOption.foreach { case (_, fn) => fn(spark, sfDir).count() }
    catch { case _: Throwable => () }
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    SparkEntry.queries.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      val dt = (System.nanoTime() - t0) / 1e9
      results(name) = dt
      // progress to stderr only; stdout carries nothing but the JSON line
      System.err.println(f"[bench] $name%-28s $dt%8.2f s")
      // storage hygiene: operators persist intermediates for their own
      // lifetime; never let them accumulate across an 87-query session
      // (r02 mid-run collapse).
      spark.catalog.clearCache()
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    Console.out.flush()
    // belt-and-braces copy that survives any stdout truncation
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LOCAL_LAST.json"), json)
    catch { case _: Throwable => () }
    spark.stop()
  }
}
