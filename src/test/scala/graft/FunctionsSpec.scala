package graft

import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkTestBase {

  test("kmin/kmax return smallest/largest values with 0-based indices") {
    import spark.implicits._
    val df = Seq(Seq(5.0f, 1.0f, 3.0f, 2.0f)).toDF("s")
    val r = df.select(
      graft.functions.kmin(col("s"), 2).as("mn"),
      graft.functions.kmax(col("s"), 2).as("mx")).collect().head
    val mn = r.getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getFloat(0), x.getInt(1)))
    val mx = r.getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getFloat(0), x.getInt(1)))
    assert(mn == Seq((1.0f, 1), (2.0f, 3)))
    assert(mx == Seq((5.0f, 0), (3.0f, 2)))
  }

  test("GraftExtensions applies its whole function list to SparkSessionExtensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext) // must register every builder without throwing
    assert(graft.GraftExtensions.all.map(_._1).distinct.size ==
      graft.GraftExtensions.all.size)
  }

  test("SQL registration exposes distance functions to spark.sql") {
    graft.functions.register(spark)
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .createOrReplaceTempView("emb_sql")
    val r = spark.sql(
      """SELECT l2sq(a.embedding, b.embedding) AS d,
        |       cosine_sim(a.embedding, b.embedding) AS c,
        |       norm_l2(a.embedding) AS n
        |FROM emb_sql a JOIN emb_sql b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin)
      .collect().head
    assert(r.getDouble(0) > 0 && math.abs(r.getDouble(2) - 1.0) < 0.01)
  }

  test("topk aggregate is callable from SQL") {
    graft.functions.register(spark)
    spark.read.parquet(s"$sf0001/lineitem.parquet")
      .createOrReplaceTempView("li_sql")
    val rows = spark.sql(
      """SELECT l_returnflag, topk(l_extendedprice, l_orderkey, 2, false) AS tk
        |FROM li_sql GROUP BY l_returnflag""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tk = r.getSeq[org.apache.spark.sql.Row](1)
      assert(tk.length == 2)
      assert(tk(0).getDouble(1) >= tk(1).getDouble(1)) // descending
    }
  }

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
