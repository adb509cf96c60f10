package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for LLM training pipelines: document
  * chunking (the unit-of-training split) and benchmark
  * decontamination (n-gram overlap sweep). Both are pure Column
  * algebra over the documents table — no UDFs, no driver loops, no
  * cross joins — so they scale like any other projection/join.
  */
object Corpus {

  /** Fixed-size token chunking with overlap: per document, chunk i
    * covers tokens [i·stride, i·stride + size), stride = size −
    * overlap; the final chunk keeps the (possibly shorter) tail.
    * Output (doc_id, chunk_no, chunk_text, n_tokens).
    *
    * At 100 TB this is a narrow map — each document expands to its
    * chunks inside its own partition (posexplode), nothing shuffles.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int = 0): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    df.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("_t"))
      .withColumn("_nc", greatest(lit(1),
        ceil((org.apache.spark.sql.functions.size(col("_t")) - lit(overlap))
          .cast("double") / lit(stride)).cast("int")))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("_nc") - 1), i =>
          array_join(slice(col("_t"), i * stride + 1, lit(size)), " ")))
          .as(Seq("chunk_no", "chunk_text")))
      .select(col("doc_id"), col("chunk_no").cast("long").as("chunk_no"),
        col("chunk_text"),
        org.apache.spark.sql.functions.size(split(col("chunk_text"), " "))
          .cast("long").as("n_tokens"))
  }

  /** Benchmark decontamination: corpus documents sharing at least one
    * distinct n-gram with ANY benchmark document, with the count of
    * shared distinct n-grams. Output (doc_id, n_shared).
    *
    * Shape: inverted shingle index on both sides joined on the
    * shingle string — an equi-join whose fanout is bounded by
    * benchmark-side shingle multiplicity (the benchmark set is small
    * by definition), never a cross join. The usual pre-training sweep
    * against eval benchmarks expressed as one join + one aggregate.
    */
  def contaminated(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, ngram: Int = 3): DataFrame = {
    def shingleIndex(df: DataFrame, out: String): DataFrame =
      df.select(col(idCol).as(out),
        explode(TextFunctions.shingleSet(col(textCol), ngram)).as("_sh"))
    shingleIndex(corpus, "doc_id")
      .join(shingleIndex(bench, "_bid").select(col("_sh")).distinct(), "_sh")
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("_sh")).as("n_shared"))
  }
}
