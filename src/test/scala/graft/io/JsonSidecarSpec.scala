package graft.io

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** RawLocalFileSystem re-registered under its own scheme: exercises
  * JsonSidecar's Hadoop FileSystem resolution (r20 — VERDICT r19 #2:
  * write() used java.nio and would drop scheme-qualified sidecars on
  * the driver's local disk) without needing a real cluster FS. */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "grafttest"
  override def getUri: java.net.URI = java.net.URI.create("grafttest:///")
}

class JsonSidecarSpec extends SparkTestBase {

  private def sampleDf = {
    import spark.implicits._
    Seq(
      (1L, "plain", Seq(1.5f, -2.0f), true),
      (2L, "quote\" slash\\ ctl\b\f\n", Seq(0.25f), false),
      (3L, null.asInstanceOf[String], Seq.empty[Float], true))
      .toDF("id", "s", "v", "flag")
  }

  test("sidecar write/read round-trips through a non-local URI scheme " +
      "(Hadoop FS resolution, zero java.nio assumptions)") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.grafttest.impl", classOf[GraftTestFs].getName)
    val tmp = java.nio.file.Files.createTempDirectory("sidecar_scheme")
    try {
      val uri = s"grafttest:$tmp/meta"
      JsonSidecar.write(sampleDf, uri)
      // the scheme's FS (RawLocal here) decided placement — the files
      // must exist where IT put them, with the Spark-source layout
      assert(java.nio.file.Files.isRegularFile(tmp.resolve("meta/part-00000.json")))
      assert(java.nio.file.Files.isRegularFile(tmp.resolve("meta/_SUCCESS")))
      // read back through the SAME scheme (driver-side parse path)
      val back = JsonSidecar.read(spark, uri)
        .select(col("id"), col("s"), col("v"), col("flag"))
        .collect().map(_.toSeq.map {
          case q: scala.collection.Seq[_] => q.toSeq
          case x => x
        }).sortBy(_.toString())
      val exp = sampleDf
        .select(col("id"), col("s"), col("v").cast("array<double>"), col("flag"))
        .collect().map(_.toSeq.map {
          case q: scala.collection.Seq[_] => q.toSeq
          case x => x
        }).sortBy(_.toString())
      assert(back === exp)
      // and through the real Spark JSON source (byte-level compatibility)
      val viaSpark = spark.read.json(s"$tmp/meta")
        .select(col("id"), col("s"), col("v"), col("flag"))
        .collect().map(_.toSeq.map {
          case q: scala.collection.Seq[_] => q.toSeq
          case x => x
        }).sortBy(_.toString())
      assert(viaSpark === exp)
    } finally graft.streaming.StreamingIngest.rmTree(tmp)
  }

  test("sidecar bytes equal the Spark JSON writer's, including the \\b \\f " +
      "short escapes (ADVICE r19)") {
    val tmp = java.nio.file.Files.createTempDirectory("sidecar_bytes")
    try {
      val df = sampleDf
      JsonSidecar.write(df, s"$tmp/ours")
      df.coalesce(1).write.mode("overwrite").json(s"$tmp/spark")
      def bytes(dir: java.nio.file.Path): String = {
        import scala.jdk.CollectionConverters._
        val part = java.nio.file.Files.list(dir).iterator().asScala
          .filter(_.getFileName.toString.startsWith("part-")).toSeq
          .filterNot(_.getFileName.toString.endsWith(".crc")).head
        new String(java.nio.file.Files.readAllBytes(part),
          java.nio.charset.StandardCharsets.UTF_8)
      }
      assert(bytes(tmp.resolve("ours")) === bytes(tmp.resolve("spark")))
    } finally graft.streaming.StreamingIngest.rmTree(tmp)
  }
}
