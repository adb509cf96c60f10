package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Minimal JSON writer for the two driver-contract mains — string
  * escaping covers backslash, quote, and ALL control chars (<0x20):
  * a tab or CR in builder-authored SQL would otherwise make the
  * driver's json.load fail and silently zero a round's correctness. */
object JsonMin {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
  def obj(kv: Iterable[(String, String)]): String =
    kv.map { case (k, v) => s"${str(k)}: ${str(v)}" }.mkString("{", ",", "}")
}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // see Bench: avoid codegen-cache eviction churn across ~90 queries
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // high-cardinality collect_list aggregates (the LSH band-bucket
      // grouping: ~1 band hash per input row) otherwise hit
      // ObjectHashAggregate's 128-entry sort-based fallback and SORT
      // the whole band table per task; entries are (long key, tiny id
      // list), so a few million hashed entries per task is cheap
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.maxPlanStringLength", "8192")
      // async block/shuffle cleanup: the blocking cleaner serializes
      // against job submission through the dispatcher and produced
      // multi-second wandering stalls across a ~90-query session
      .config("spark.cleaner.referenceTracking.blocking", "false")
      .config("spark.cleaner.referenceTracking.blocking.shuffle", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    // Dev-only subset (unset in the driver environment): iterate on a
    // few queries without the full 127-query dump.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // No clearCache here: the catalog memoizes trained indexes and
      // the shared dedup pipeline across queries (Queries.cached);
      // purging per query forces full retrains (r03 bench collapse).
      // Operators unpersist their own large intermediates.
    }
    // Trained-state sidecars for the sidecar-based oracle SQLs: written
    // from the same session, so they are exactly the models the
    // compared outputs used (Queries memoizes builds per session).
    try Queries.writeOracleAux(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[verify] oracle-aux write failed: ${e.getMessage}")
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      JsonMin.obj(SparkEntry.oracleSql
        .filter { case (name, _) => only.forall(_.contains(name)) }))
    spark.stop()
  }
}
