package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim

/** The fused text kernels ([[graft.core.TextKernels]]) against the
  * builtin-expression chains they replace — the chains ARE the
  * executable spec (and stay what the DuckDB oracle replays), so
  * equivalence here is what keeps the oracle green after the fusion. */
class TextKernelsSpec extends SparkTestBase {

  import graft.llm.{TextFunctions => TF}

  // tricky shapes: empty text, 1 token, exactly n tokens, consecutive
  // spaces (empty tokens), trailing/leading spaces, repeated shingles,
  // unicode, long doc
  private val docs = Seq(
    "",
    "one",
    "a b c",
    "a b c d e",
    "a  b c",        // empty middle token
    " a b c",        // leading empty token
    "a b c ",        // trailing empty token
    "x y x y x y x", // repeated shingles collapse in the set
    "héllo wörld héllo wörld héllo",
    (1 to 200).map(i => s"tok${i % 37}").mkString(" ")
  )

  private def df = {
    import spark.implicits._
    docs.toDF("text")
  }

  private def builtinShingleSet(text: org.apache.spark.sql.Column, n: Int) =
    array_distinct(TF.shingles(text, n))

  test("ShingleSetK == array_distinct(shingles) builtin chain") {
    val got = df.select(
      TF.shingleSet(col("text"), 3).as("k"),
      builtinShingleSet(col("text"), 3).as("b"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"kernel ${r.getSeq[String](0)} != builtin ${r.getSeq[String](1)}")
    }
  }

  test("MinHashBandsK == lshBandHashes(minhashSignature(shingleSet)) chain") {
    val chain = TF.lshBandHashes(
      TF.minhashSignature(builtinShingleSet(col("text"), 3), 12), 4, 3)
    val got = df.select(
      TF.minhashBands(col("text"), 3, 12, 4).as("k"), chain.as("b")).collect()
    got.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"kernel ${r.getSeq[String](0)} != chain ${r.getSeq[String](1)}")
    }
  }

  test("QualityScoreK == builtin quality formula, bit-exact") {
    val got = df.filter(length(col("text")) > 0).select(
      TF.qualityScore(col("text"), TF.EnStopwords).as("k"),
      TF.qualityScoreBuiltin(col("text"), TF.EnStopwords).as("b")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"kernel ${r.getDouble(0)} != builtin ${r.getDouble(1)}")
    }
  }

  test("MinHashBandsHashSetK == (60-bit MinHashBandsK, hashed ShingleSetK) pair") {
    val got = df.select(
      TF.minhashBandsAndHashSet(col("text"), 3, 12, 4).as("bs"),
      transform(TF.minhashBands(col("text"), 3, 12, 4),
        h => conv(substring(h, 1, 15), 16, 10).cast("long")).as("mb"),
      array_sort(transform(TF.shingleSet(col("text"), 3),
        s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))).as("sh"))
      .select(col("bs.bands"), col("bs.sh"), col("mb"), col("sh"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](2),
        s"fused bands ${r.getSeq[Long](0)} != ${r.getSeq[Long](2)}")
      assert(r.getSeq[Long](1) == r.getSeq[Long](3),
        s"fused shingle hashes ${r.getSeq[Long](1)} != ${r.getSeq[Long](3)}")
    }
  }

  test("SortedLongIntersectK == size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    import org.apache.spark.sql.graft.shim
    val pairs = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(4L), Seq(4L)),
      (Seq(1L, 2L, 3L), Seq(7L, 8L)),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue))
    ).toDF("a", "b")
    val inter = shim.col(graft.core.SortedLongIntersectK(
      shim.expr(col("a")), shim.expr(col("b"))))
    val got = pairs.select(inter.as("k"),
      size(array_intersect(col("a"), col("b"))).as("s")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("PairTailsK == transform/slice pair-expansion chain") {
    import spark.implicits._
    import org.apache.spark.sql.graft.shim
    val buckets = Seq(Seq(1L, 2L), Seq(3L, 5L, 5L, 9L), Seq(7L),
      Seq.empty[Long], (1L to 20L).toSeq).toDF("_ids")
    val ids = col("_ids")
    def expand(c: org.apache.spark.sql.Column) =
      buckets.select(explode(c).as("_p"))
        .select(col("_p.i").as("i"), explode(col("_p.tail")).as("j"))
        .filter(col("i") < col("j")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val kernel = expand(shim.col(graft.core.PairTailsK(shim.expr(ids))))
    val chain = expand(transform(ids, (x, i) =>
      struct(x.as("i"), slice(ids, i + lit(2), size(ids) - i - lit(1)).as("tail"))))
    assert(kernel == chain)
  }

  test("Md5Prefix60K == conv(substring(md5, 1, 15), 16, 10) builtin chain") {
    val got = df.select(
      TF.fingerprint60(col("text")).as("k"),
      conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("b"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"md5 prefix kernel ${r.getLong(0)} != builtin ${r.getLong(1)}"))
  }

  test("kernels hold on the real documents table (sf0.001)") {
    val real = spark.read.parquet(s"$sf0001/documents.parquet")
    val sh = real.select(
      TF.shingleSet(col("text"), 3).as("k"),
      builtinShingleSet(col("text"), 3).as("b"))
      .filter(not(col("k") === col("b")))
    assert(sh.count() == 0, "shingle kernel diverges on real docs")
    val mb = real.select(
      TF.minhashBands(col("text"), 3, 12, 4).as("k"),
      TF.lshBandHashes(
        TF.minhashSignature(builtinShingleSet(col("text"), 3), 12), 4, 3).as("b"))
      .filter(not(col("k") === col("b")))
    assert(mb.count() == 0, "band kernel diverges on real docs")
  }

  test("kernel expressions stay inside whole-stage codegen (no fallback)") {
    withSQLConf("spark.sql.codegen.fallback" -> "false") {
      import org.apache.spark.sql.graft.shim
      val bs = TF.minhashBandsAndHashSet(col("text"), 3, 12, 4)
      val out = df.select(
        TF.shingleSet(col("text"), 3).as("s"),
        TF.minhashBands(col("text"), 3, 12, 4).as("m"),
        bs.as("bs"),
        shim.col(graft.core.SortedLongIntersectK(
          shim.expr(bs.getField("sh")), shim.expr(bs.getField("sh")))).as("ix"),
        shim.col(graft.core.PairTailsK(
          shim.expr(typedlit(Seq(1L, 2L, 3L))))).as("pt"),
        TF.fingerprint60(col("text")).as("f60"),
        TF.qualityScore(col("text"), TF.EnStopwords).as("q"))
        .collect()
      assert(out.length == docs.length)
    }
  }

  private def withSQLConf[T](kv: (String, String)*)(f: => T): T = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
