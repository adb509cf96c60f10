package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for LLM-training-data pipelines, built
  * entirely from codegen'd Spark SQL builtins so every step has an
  * exact DuckDB-SQL equivalent for the correctness oracle.
  *
  * Hash parity: MinHash and fingerprints use md5 over UTF-8 strings —
  * identical in Spark and DuckDB — rather than engine-private hashes.
  * MinHash "hash function j" = md5 of "j:" ++ shingle; the signature
  * component is the lexicographic min of the hex digests, a standard
  * min-wise permutation family.
  */
object TextFunctions {

  /** Whitespace tokenization (documents.text is single-space joined). */
  def tokenize(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokenize(text)).cast("long")

  /** Word n-gram shingles joined by single spaces; empty when the doc
    * has fewer than n tokens. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokenize(text)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array())
  }

  /** Distinct shingle set (the Jaccard universe). Computed by the
    * fused [[graft.core.ShingleSetK]] kernel — semantically identical
    * to `array_distinct(shingles(text, n))` but a single codegen'd
    * invokestatic instead of an interpreted
    * split→transform→array_distinct tree (the r07 driver bench showed
    * that tree's cost varying 54× across sessions on JIT
    * deopt/recompile luck). */
  def shingleSet(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.shim
    shim.col(graft.core.ShingleSetK(shim.expr(text), n))
  }

  /** MinHash signature: one md5 per shingle (hex prefix → 60-bit int,
    * reduced mod [[graft.core.MinHashSig.M]], computed by the
    * [[graft.core.MinHashBase]] kernel — one expression call per row,
    * not an interpreted lambda per shingle), then `h` linear
    * permutations min-reduced in a single pass
    * ([[graft.core.MinHashSig]]). ~h× cheaper than hashing every
    * (j, shingle) pair, with identical DuckDB-SQL reproducibility.
    * Empty-shingle docs get nulls in the signature (never match). */
  def minhashSignature(shingleSet: Column, h: Int): Column = {
    import org.apache.spark.sql.graft.shim
    shim.col(graft.core.MinHashSig(
      graft.core.MinHashBase(shim.expr(shingleSet)), h))
  }

  /** LSH band hashes: `bands` digests, each over `rowsPerBand`
    * consecutive signature components. Candidates = docs sharing any
    * (band_id, band_hash). */
  def lshBandHashes(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws("|",
        slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)).cast("array<string>"))))

  /** Fused text → LSH band hashes ([[graft.core.MinHashBandsK]]):
    * one codegen'd kernel call per row equivalent to
    * `lshBandHashes(minhashSignature(shingleSet(text, ngram), hashes),
    * bands, hashes/bands)` — the whole signature pipeline in a single
    * stable compiled loop. The oracle SQL replaying the chain is
    * unchanged. */
  def minhashBands(text: Column, ngram: Int, hashes: Int, bands: Int): Column = {
    import org.apache.spark.sql.graft.shim
    shim.col(graft.core.MinHashBandsK(shim.expr(text), ngram, hashes, bands))
  }

  /** Fused text → struct(bands, sh)
    * ([[graft.core.MinHashBandsHashSetK]]): the LSH band hashes AND
    * the sorted distinct 60-bit shingle-hash set from ONE
    * tokenize+shingle pass — the near-dup pipeline consumes both, and
    * computing them separately costs a second scan + repartition +
    * shingle pass over the corpus. */
  def minhashBandsAndHashSet(text: Column, ngram: Int, hashes: Int, bands: Int): Column = {
    import org.apache.spark.sql.graft.shim
    shim.col(graft.core.MinHashBandsHashSetK(shim.expr(text), ngram, hashes, bands))
  }

  /** Document fingerprint (content hash). */
  def fingerprint(text: Column): Column = md5(text)

  /** 60-bit md5-prefix content hash as a long
    * ([[graft.core.Md5Prefix60K]]; DuckDB parity:
    * `('0x' || substr(md5(x), 1, 15))::BIGINT`). */
  def fingerprint60(text: Column): Column = {
    import org.apache.spark.sql.graft.shim
    shim.col(graft.core.Md5Prefix60K(shim.expr(text)))
  }

  /** Fraction of tokens found in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokenize(text)
    val sw = array(stopwords.map(lit): _*)
    size(filter(toks, t => array_contains(sw, t))).cast("double") /
      size(toks).cast("double")
  }

  def avgTokenLength(text: Column): Column = {
    val toks = tokenize(text)
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      size(toks).cast("double")
  }

  /** Heuristic quality score in [0,1]: rewards mid-length docs, short
    * tokens, and stopword presence (n-gram/stopword heuristics in the
    * C4/Gopher tradition; exact formula is ours, deterministic). */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    import org.apache.spark.sql.graft.shim
    shim.col(graft.core.QualityScoreK(shim.expr(text), stopwords))
  }

  /** The builtin-composed form of [[qualityScore]] (kept as the
    * executable spec the kernel is tested against; the kernel uses the
    * same double arithmetic in the same order). */
  def qualityScoreBuiltin(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val swScore = least(stopwordRatio(text, stopwords) * 5.0, lit(1.0))
    val tokScore = when(avgTokenLength(text) <= 8.0, 1.0).otherwise(0.5)
    (lenScore + swScore + tokScore) / 3.0
  }

  val EnStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  // ---- PII redaction ----------------------------------------------------
  // The standard pre-training scrub pass: emails, simple phone numbers
  // and IPv4 literals replaced by type tags. Patterns are kept inside
  // the RE2-compatible subset so the identical regex runs in any ANSI
  // engine (the oracle replays them verbatim); all matching happens in
  // codegen'd regexp_replace/regexp_count — no UDFs.
  val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiPhone = "\\b555-[0-9]{4}\\b"
  val PiiIpv4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redact in a fixed order (email first — its char class contains
    * '.' digits and would otherwise re-match a redacted IP tag). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, PiiEmail, "[EMAIL]"),
        PiiPhone, "[PHONE]"),
      PiiIpv4, "[IP]")

  /** Total PII matches (pre-redaction) per document. */
  def piiCount(text: Column): Column =
    regexp_count(text, lit(PiiEmail)) + regexp_count(text, lit(PiiPhone)) +
      regexp_count(text, lit(PiiIpv4))
}
