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
  /** CCNet-style line-level boilerplate removal: split every document
    * into fixed `window`-token lines, count each distinct line's
    * document frequency across the corpus (one hash shuffle — the
    * shape this op has at any scale; CCNet dedups paragraphs exactly
    * this way), drop lines occurring in more than `maxDfFrac` of the
    * documents, and reassemble the survivors in order. Output
    * (id, n_lines, n_dropped, kept_md5) — the md5 of the reassembled
    * text (comparable across engines without shipping full texts);
    * documents with empty/null text contribute no lines and are
    * OMITTED from the output (the SQL range(0, 0) behavior). The
    * corpus has no newlines,
    * so the fixed token window stands in for the line split — the
    * dataflow (per-line df + threshold + ordered reassembly) is the
    * real operator. */
  def dropBoilerplate(df: DataFrame, idCol: String, textCol: String,
      window: Int = 8, maxDfFrac: Double = 0.5): DataFrame = {
    val nDocs = df.count()
    val toks = df.select(col(idCol).as("id"), split(col(textCol), " ").as("_t"))
    // guard: sequence(0, -1) DESCENDS in Spark, so an empty document
    // must produce an empty line array (it then simply drops out of
    // the exploded output, matching the SQL range(0, 0) behavior)
    val nl = ceil(size(col("_t")).cast("double") / window).cast("int")
    val lines = toks.select(col("id"),
        posexplode(when(nl > 0, transform(sequence(lit(0), nl - 1),
          i => concat_ws(" ", slice(col("_t"), i * window + 1, lit(window)))))
          .otherwise(array().cast("array<string>")))
          .as(Seq("pos", "line")))
    val dfCounts = lines.groupBy(col("line"))
      .agg(countDistinct(col("id")).as("_df"))
      .filter(col("_df") > math.max(1.0, maxDfFrac * nDocs))
      .select(col("line"), lit(true).as("_drop"))
    lines.join(dfCounts, Seq("line"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("_drop"), 1L).otherwise(0L)).as("n_dropped"),
        concat_ws(" ", sort_array(collect_list(
          when(col("_drop").isNull, struct(col("pos"), col("line")))))
          .getField("line")).as("kept_text"))
      .select(col("id"), col("n_lines"), col("n_dropped"),
        md5(col("kept_text")).as("kept_md5"))
  }

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
