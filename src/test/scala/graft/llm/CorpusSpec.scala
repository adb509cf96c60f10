package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Corpus-preparation operators: chunk boundaries/overlap and the
  * decontamination join. */
class CorpusSpec extends SparkTestBase {

  test("chunk: short docs give one chunk, boundaries respect stride and tail") {
    val spark0 = spark
    import spark0.implicits._
    val doc = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, "a b c"), (2L, doc)).toDF("doc_id", "text")
    val got = Corpus.chunk(df, "doc_id", "text", size = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    // doc 1: 3 tokens <= size -> one chunk, n_tokens = 3
    assert(got.filter(_._1 == 1L).toSeq == Seq((1L, 0L, "a b c", 3L)))
    // doc 2: 10 tokens, stride 3 -> ceil(9/3) = 3 chunks: [1..4],[4..7],[7..10]
    val c2 = got.filter(_._1 == 2L).toSeq
    assert(c2.map(_._3) == Seq("w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    // consecutive chunks share exactly `overlap` tokens
    c2.sliding(2).foreach { case Seq(a, b) =>
      assert(a._3.split(" ").takeRight(1).toSeq == b._3.split(" ").take(1).toSeq)
    }
  }

  test("contaminated: flags only docs sharing an n-gram with the benchmark") {
    val spark0 = spark
    import spark0.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),   // shares "quick brown fox"
      (2L, "totally unrelated text here"), // clean
      (3L, "a quick brown fox again")      // shares too
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "very quick brown fox indeed")).toDF("doc_id", "text")
    val got = Corpus.contaminated(corpus, bench, "doc_id", "text", ngram = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.keySet == Set(1L, 3L), s"flagged ${got.keySet}")
    assert(got(1L) >= 1 && got(3L) >= 1)
  }
}
