package graft.io

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** TexMex .fvecs/.bvecs/.ivecs readers (contrib/vecs_io.py,
  * contrib/datasets.py:36): each record is a little-endian int32 d
  * followed by d components. With constant d the record length is
  * fixed, so `sc.binaryRecords` gives a fully distributed, splittable
  * read — no driver bottleneck at any file size. */
object VecsIO {

  private def dimOf(path: String): Int = {
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
    try {
      val b = new Array[Byte](4)
      require(in.read(b) == 4, s"$path: empty file")
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
    } finally in.close()
  }

  def readFvecs(spark: SparkSession, path: String): DataFrame = {
    val d = dimOf(path)
    val rdd = spark.sparkContext.binaryRecords(path, 4 + 4 * d)
      .map { rec =>
        val bb = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
        val dd = bb.getInt
        require(dd == d, s"inconsistent dim $dd vs $d")
        val v = new Array[Float](d)
        var i = 0
        while (i < d) { v(i) = bb.getFloat; i += 1 }
        v
      }
      .zipWithIndex()
      .map { case (v, i) => Row(i, v.toSeq) }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vec", ArrayType(FloatType, containsNull = false)))))
  }

  def readIvecs(spark: SparkSession, path: String): DataFrame = {
    val d = dimOf(path)
    val rdd = spark.sparkContext.binaryRecords(path, 4 + 4 * d)
      .map { rec =>
        val bb = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
        bb.getInt
        val v = new Array[Int](d)
        var i = 0
        while (i < d) { v(i) = bb.getInt; i += 1 }
        v
      }
      .zipWithIndex()
      .map { case (v, i) => Row(i, v.toSeq) }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vec", ArrayType(IntegerType, containsNull = false)))))
  }

  def readBvecs(spark: SparkSession, path: String): DataFrame = {
    val d = dimOf(path)
    val rdd = spark.sparkContext.binaryRecords(path, 4 + d)
      .map { rec =>
        val bb = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
        bb.getInt
        val v = new Array[Byte](d)
        bb.get(v)
        v
      }
      .zipWithIndex()
      .map { case (v, i) => Row(i, v) }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("code", BinaryType))))
  }

  /** Test/fixture helper: write float vectors as .fvecs locally. */
  def writeFvecsLocal(path: String, vecs: Iterator[Array[Float]]): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path))
    try vecs.foreach { v =>
      val bb = ByteBuffer.allocate(4 + 4 * v.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(v.length)
      v.foreach(bb.putFloat)
      out.write(bb.array())
    } finally out.close()
  }
}
