package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.llm.TextFunctions._

/** Deduplication operators for LLM-training-data pipelines.
  *
  * Scale design: every operator is a grouped/bucketed shuffle on a
  * content key (exact hash, LSH band hash), NEVER an all-pairs cross
  * join — candidate generation at 100 TB must shuffle each row a
  * constant number of times (once per band). The exact-dup operator is
  * the IVFFlatDedup analog (faiss/IndexIVFFlat.h:56-104: unique
  * vectors stored once + an `instances` multimap).
  */
object Dedup {

  /** Exact duplicate groups on `key`: one representative (min id) per
    * distinct key + the sorted instance list (IVFFlatDedup's
    * `instances` table). Single hash-shuffle on the key. */
  def exactDupGroups(df: DataFrame, idCol: String, key: Column): DataFrame =
    df.groupBy(key.as("_k"))
      .agg(min(col(idCol)).as("rep_id"),
        count(lit(1)).as("cnt"),
        sort_array(collect_list(col(idCol))).as("ids"))
      .drop("_k")

  /** Rows surviving exact dedup (first id wins). */
  def dropExactDups(df: DataFrame, idCol: String, key: Column): DataFrame = {
    val reps = exactDupGroups(df, idCol, key).select(col("rep_id").as(idCol))
    df.join(reps, idCol, "left_semi")
  }

  /** MinHash-LSH candidate pairs (i < j) over text n-gram shingles:
    * signature → band hashes → explode → self-equi-join on
    * (band_id, band_hash) → distinct. Each doc is shuffled `bands`
    * times regardless of corpus size. */
  def minhashLshCandidates(docs: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, hashes: Int = 12, bands: Int = 4): DataFrame = {
    require(hashes % bands == 0, "hashes must divide into bands")
    val r = hashes / bands
    val sig = docs.select(col(idCol).as("_id"),
      minhashSignature(shingleSet(col(textCol), ngram), hashes).as("_sig"))
    // The signature (shingling + hashes*|shingles| md5s per doc) is by
    // far the most expensive expression in the pipeline and the band
    // table feeds both sides of the self-join plus the verify stage —
    // persist it so it is computed exactly once per document.
    val banded = sig.select(col("_id"),
      posexplode(lshBandHashes(col("_sig"), bands, r)).as(Seq("band_id", "band_hash")))
      .filter(col("band_hash").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    banded.as("a").join(banded.as("b"),
        col("a.band_id") === col("b.band_id") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a._id") < col("b._id"))
      .select(col("a._id").as("i"), col("b._id").as("j"))
      .distinct()
  }

  /** Exact n-gram Jaccard for given (i, j) pairs. */
  def pairJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, ngram: Int = 3): DataFrame = {
    val sets = docs.select(col(idCol).as("_id"),
      shingleSet(col(textCol), ngram).as("_set"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs
      .join(sets.select(col("_id").as("i"), col("_set").as("_sa")), "i")
      .join(sets.select(col("_id").as("j"), col("_set").as("_sb")), "j")
      .withColumn("_inter", size(array_intersect(col("_sa"), col("_sb"))).cast("double"))
      .withColumn("_union",
        (size(col("_sa")) + size(col("_sb"))).cast("double") - col("_inter"))
      .withColumn("jaccard",
        when(col("_union") > 0, col("_inter") / col("_union")).otherwise(0.0))
      .select(col("i"), col("j"), col("jaccard"))
  }

  /** Near-dup pairs: LSH candidates verified by exact shingle Jaccard
    * >= threshold — the standard MinHash dedup pipeline. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, ngram: Int = 3, hashes: Int = 12,
      bands: Int = 4): DataFrame = {
    val cand = minhashLshCandidates(docs, idCol, textCol, ngram, hashes, bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairJaccard(cand, docs, idCol, textCol, ngram)
      .filter(col("jaccard") >= threshold)
  }

  /** The corpus after near-dup removal: for every verified pair
    * (i, j), the higher id j is dropped (keep-first policy — the
    * standard LLM-training-data dedup rule; a connected-components
    * variant would union labels first). */
  def dropNearDups(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, ngram: Int = 3, hashes: Int = 12,
      bands: Int = 4): DataFrame = {
    val losers = nearDupPairs(docs, idCol, textCol, threshold, ngram, hashes, bands)
      .select(col("j").as(idCol)).distinct()
    docs.join(broadcast(losers), Seq(idCol), "left_anti")
  }

  /** Connected components over near-dup pairs by distributed min-label
    * propagation: each node repeatedly adopts the smallest label in
    * its neighborhood until fixpoint. Near-dup graphs are shallow
    * (tiny cliques/chains), so this converges in a few joins; each
    * iteration is one shuffle of the EDGE set, never the corpus.
    * Returns (id, component) where component = min id of the group. */
  def nearDupComponents(ids: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id", maxIter: Int = 10): DataFrame = {
    val sym = pairs.select(col("i").as("src"), col("j").as("dst"))
      .unionByName(pairs.select(col("j").as("src"), col("i").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = ids.select(col(idCol).as("id"), col(idCol).as("component"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val neighborMin = sym
        .join(labels.select(col("id").as("dst"), col("component").as("_nl")), "dst")
        .groupBy(col("src").as("id")).agg(min(col("_nl")).as("_nmin"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("_nmin"), col("component")))
            .as("component"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val changed = next.join(labels.withColumnRenamed("component", "_old"), "id")
        .filter(col("component") =!= col("_old")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      it += 1
    }
    sym.unpersist()
    labels
  }

  /** All-pairs exact n-gram Jaccard above a threshold via an inverted
    * shingle index (explode + equi-join on the shingle, then count) —
    * no cross join; pairs sharing zero shingles are never generated. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, ngram: Int = 3,
      maxShingleDf: Option[Int] = None): DataFrame = {
    val exploded = docs.select(col(idCol).as("_id"),
      explode(shingleSet(col(textCol), ngram)).as("_sh"))
    val sizes = exploded.groupBy("_id").agg(count(lit(1)).as("_n"))
    // Skew guard for 100 TB corpora: a shingle appearing in f docs
    // generates f² candidate rows, so a handful of boilerplate
    // shingles can dominate the join. Capping document frequency
    // drops only those hot keys; any pair sharing a rarer shingle is
    // still generated (estimated Jaccard then uses the kept-shingle
    // counts — exact when no cap is set, the default).
    val forJoin = maxShingleDf match {
      case Some(cap) =>
        val hot = exploded.groupBy("_sh").agg(count(lit(1)).as("_df"))
          .filter(col("_df") > cap).select("_sh")
        exploded.join(broadcast(hot), Seq("_sh"), "left_anti")
      case None => exploded
    }
    val inter = forJoin.as("a").join(forJoin.as("b"),
        col("a._sh") === col("b._sh") && col("a._id") < col("b._id"))
      .groupBy(col("a._id").as("i"), col("b._id").as("j"))
      .agg(count(lit(1)).as("_c"))
    inter
      .join(sizes.select(col("_id").as("i"), col("_n").as("_na")), "i")
      .join(sizes.select(col("_id").as("j"), col("_n").as("_nb")), "j")
      .withColumn("jaccard",
        col("_c").cast("double") / (col("_na") + col("_nb") - col("_c")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("i"), col("j"), col("jaccard"))
  }

  /** SimHash near-dup candidates: LSH on 16-bit chunks of the 64-bit
    * simhash (docs within Hamming distance 3 of each other share at
    * least one exact chunk by pigeonhole over 4 chunks), verified by
    * full 64-bit Hamming <= maxHamming. Grouped shuffle, no cross
    * join. */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("_id"),
      graft.functions.simhash64(TextFunctions.tokenize(col(textCol))).as("_sh"))
    val chunked = sh.select(col("_id"), col("_sh"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("_sh"), c * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("chunk_id", "chunk")))
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk_id") === col("b.chunk_id") &&
        col("a.chunk") === col("b.chunk") && col("a._id") < col("b._id"))
      .select(col("a._id").as("i"), col("b._id").as("j"),
        col("a._sh").as("_sa"), col("b._sh").as("_sb"))
      .distinct()
      .withColumn("hamming", bit_count(col("_sa").bitwiseXOR(col("_sb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("i"), col("j"), col("hamming"))
  }

  /** Embedding near-dup pairs (cosine >= threshold), brute-force form:
    * for the scale path bucket by LSH sign bits or route through
    * [[graft.index.IvfIndex]] range search instead. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("i"), col(vecCol).as("_va"))
    val b = df.select(col(idCol).as("j"), col(vecCol).as("_vb"))
    a.crossJoin(b).filter(col("i") < col("j"))
      .withColumn("cos", graft.functions.cosine_sim(col("_va"), col("_vb")))
      .filter(col("cos") >= threshold)
      .select(col("i"), col("j"), col("cos"))
  }
}
