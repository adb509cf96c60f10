package graft.index

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SqTrainSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()
  private lazy val local: Array[Array[Double]] = {
    // d column-major copies for driver-side reference computations
    val rows = emb.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val d = rows.head.length
    Array.tabulate(d)(j => rows.map(_(j).toDouble))
  }

  test("meanstd range matches the per-dim mean/population-std formula") {
    val (vmin, vdiff) = SqIndex.trainRange(emb, "embedding", "meanstd", rsArg = 2.5)
    assert(vmin.length == local.length)
    local.indices.foreach { j =>
      val xs = local(j)
      val mean = xs.sum / xs.length
      val varr = xs.map(x => x * x).sum / xs.length - mean * mean
      val std = if (varr <= 0) 1.0 else math.sqrt(varr)
      assert(math.abs(vmin(j) - (mean - 2.5 * std)) < 1e-6, s"dim $j vmin")
      assert(math.abs(vdiff(j) - 5.0 * std) < 1e-6, s"dim $j vdiff")
    }
  }

  test("quantiles range is the exact order statistic with reference clamping") {
    val rs = 0.05
    val (vmin, vdiff) = SqIndex.trainRange(emb, "embedding", "quantiles", rsArg = rs)
    val n = local.head.length
    val o = math.max(0, math.min((rs * n).toInt, n / 2))
    local.indices.foreach { j =>
      val sorted = local(j).sorted
      assert(vmin(j) == sorted(o), s"dim $j lo")
      assert(math.abs(vdiff(j) - (sorted(n - 1 - o) - sorted(o))) < 1e-12, s"dim $j hi")
    }
  }

  test("minmax with rsArg expands the range symmetrically") {
    val (m0, d0) = SqIndex.trainRange(emb, "embedding", "minmax", rsArg = 0.0)
    val (m1, d1) = SqIndex.trainRange(emb, "embedding", "minmax", rsArg = 0.1)
    m0.indices.foreach { j =>
      assert(math.abs((m0(j) - m1(j)) - 0.1 * d0(j)) < 1e-9)
      assert(math.abs(d1(j) - 1.2 * d0(j)) < 1e-9)
    }
  }

  test("RS_optim refines the minmax range and does not regress roundtrip error") {
    def err(ix: SqIndex): Double =
      ix.reconstruct.join(emb.select(col("vec_id").as("id"), col("embedding")), "id")
        .select(aggregate(zip_with(col("embedding").cast("array<double>"), col("vec"),
          (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x).as("e"))
        .agg(sum("e")).collect().head.getDouble(0)
    val eMm = err(SqIndex.build(emb, "vec_id", "embedding"))
    val eOpt = err(SqIndex.build(emb, "vec_id", "embedding", "optim"))
    // the alternation minimizes quantization MSE under round-to-nearest
    // assignment; our encoder's floor(+0.5-shifted decode) differs by
    // half a step, so allow a small tolerance rather than strict <
    assert(eOpt.isFinite && eOpt > 0)
    assert(eOpt <= eMm * 1.05, s"optim $eOpt vs minmax $eMm")
    // the refit must actually move the range off the raw min/max
    val (m0, d0) = SqIndex.trainRange(emb, "embedding", "minmax")
    val (m1, d1) = SqIndex.trainRange(emb, "embedding", "optim")
    assert(m0.indices.exists(j => math.abs(m0(j) - m1(j)) > 1e-9 ||
      math.abs(d0(j) - d1(j)) > 1e-9))
  }

  test("meanstd-trained SQ8 roundtrip error is finite and close to minmax on gaussian-ish data") {
    def err(ix: SqIndex): Double =
      ix.reconstruct.join(emb.select(col("vec_id").as("id"), col("embedding")), "id")
        .select(aggregate(zip_with(col("embedding").cast("array<double>"), col("vec"),
          (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x).as("e"))
        .agg(sum("e")).collect().head.getDouble(0)
    val eMm = err(SqIndex.build(emb, "vec_id", "embedding"))
    // rsArg=4: essentially no mass beyond +-4 sigma, so error is pure
    // step size — the (8 sigma / data range)^2 ratio, ~2x on this data.
    // (At rsArg=2.5 the ~1% clamped tail dominates: large but correct,
    // the reference clamps identically.)
    val eMs = err(SqIndex.build(emb, "vec_id", "embedding", "meanstd", rsArg = 4.0))
    assert(eMs.isFinite && eMs > 0)
    assert(eMs < 4 * eMm, s"meanstd $eMs vs minmax $eMm")
  }
}
