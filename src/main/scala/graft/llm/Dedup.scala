package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.llm.TextFunctions._

/** Deduplication operators for LLM-training-data pipelines.
  *
  * Scale design: every operator is a grouped/bucketed shuffle on a
  * content key (exact hash, LSH band hash, coarse-quantizer cell),
  * NEVER an all-pairs cross join — candidate generation at 100 TB must
  * shuffle each row a constant number of times (once per band / probed
  * cell). The exact-dup operator is the IVFFlatDedup analog
  * (faiss/IndexIVFFlat.h:56-104: unique vectors stored once + an
  * `instances` multimap).
  *
  * Cache lifecycle: pipelines that reuse an intermediate (band table,
  * shingle sets) persist it, force the small verified-pair result, and
  * unpersist the intermediates before returning — a long catalog
  * session must not accumulate storage (VERDICT r02 finding #6). The
  * returned pair DataFrame stays cached so consumers (candidate
  * listing, keep-first removal, components) don't re-run the
  * signature pipeline per action; call [[Dedup.release]] when done
  * with it — a long-lived 100 TB pipeline must hand storage back.
  */
object Dedup {

  /** Release the cached pair set returned by [[minhashLshCandidates]],
    * [[pairJaccard]], [[nearDupPairs]] or [[embeddingNearDups]]. After
    * this the DataFrame is still valid but recomputes from source on
    * the next action. */
  def release(pairs: DataFrame): Unit =
    pairs.unpersist(blocking = false)

  private val Disk = StorageLevel.MEMORY_AND_DISK

  /** CPU-bound text kernels (shingling, per-shingle hashing) must not
    * inherit the input's file-split parallelism: a corpus that arrives
    * as few parquet files would hash on as few cores. A shuffle-free
    * lineage (scan/project/filter/generate/union) is repartitioned to
    * the cluster's default parallelism; a lineage that already
    * contains a shuffle (repartition/aggregate/join/…) passes through
    * unchanged — it runs at `spark.sql.shuffle.partitions`, which is
    * sized for the cluster, and repartitioning again would only add a
    * shuffle. Decided from the ANALYZED plan, never by executing:
    * `df.rdd.getNumPartitions` under AQE materializes every upstream
    * stage just to count partitions (profiled as a whole redundant
    * corpus-derivation job per pipeline). */
  private def widen(df: DataFrame): DataFrame = graft.core.Widen(df)

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

  /** The (id, band_id, band_hash) LSH band table. The signature
    * (shingling + hashes*|shingles| md5s per doc) is by far the most
    * expensive expression in the pipeline and the band table feeds both
    * sides of the self-join — callers persist it for the duration of
    * the candidate join. */
  private[graft] def bandTable(docs: DataFrame, idCol: String, textCol: String,
      ngram: Int, hashes: Int, bands: Int): DataFrame = {
    require(hashes % bands == 0, "hashes must divide into bands")
    val bh = widen(docs).select(col(idCol).as("_id"),
      minhashBands(col(textCol), ngram, hashes, bands).as("_bh"))
    bh.select(col("_id"),
      posexplode(col("_bh")).as(Seq("band_id", "band_hash")))
      .filter(col("band_hash").isNotNull)
  }

  /** Bucket-grouped candidate generation: ONE hash-shuffle of the band
    * table into (band_id, band_hash) buckets, then in-bucket pair
    * expansion over the sorted id list (codegen'd higher-order
    * functions, i < j by construction). Replaces a sort-merge
    * self-join + distinct (two sorted sides + an extra shuffle —
    * profiled 9.6 s vs ~3 s at a 1.2M-row band table). Bucket sizes
    * are bounded by LSH band selectivity; a pathological bucket emits
    * the same O(B²) pairs either way — the quadratic candidate OUTPUT,
    * not the grouping, is the scale limit, exactly as in the
    * self-join formulation. The expansion is TWO chained generators —
    * (anchor, tail-slice) rows then one explode per tail — so no
    * single row ever materializes more than O(B) values (a one-shot
    * flatten would build the whole O(B²) pair array in one row). */
  private[graft] def candidatesFrom(banded: DataFrame,
      maxBucket: Int = 0): DataFrame = {
    import org.apache.spark.sql.graft.shim
    val ids = col("_ids")
    val buckets = banded.groupBy(col("band_id"), col("band_hash"))
      .agg(sort_array(collect_list(col("_id"))).as("_ids"))
      .filter(size(ids) >= 2)
    // hot-bucket cap (maxBucket > 0): DROP buckets above the cap
    // before pair expansion — the ngramJaccardPairs max-df idiom. A
    // bucket of B docs emits O(B²) pairs, so one boilerplate/template
    // cluster can dominate the whole candidate join; capping bounds
    // per-bucket work at O(maxBucket²) and hands those clusters to the
    // exact-dup pass (identical texts) or the other bands (partial
    // overlaps). The trade is explicit and published (recall loss only
    // inside dropped buckets), exactly like max-df in the shingle
    // inverted index.
    (if (maxBucket > 0) buckets.filter(size(ids) <= maxBucket) else buckets)
      // pair expansion as ONE codegen'd kernel call per bucket
      // (graft.core.PairTailsK) — the equivalent
      // `transform(ids, (x, k) -> struct(x, slice(ids, ...)))` chain
      // runs interpreted (ArrayTransform/Slice are CodegenFallback)
      // and profiled as the hottest stage of the at-scale near-dup
      // candidate join
      .select(explode(shim.col(
        graft.core.PairTailsK(shim.expr(ids)))).as("_p"))
      .select(col("_p.i").as("i"), explode(col("_p.tail")).as("j"))
      // a repeated id inside one bucket (duplicate source ids) would
      // otherwise emit an (x, x) self-pair the old a._id < b._id
      // self-join never produced
      .filter(col("i") < col("j"))
      .distinct()
  }

  /** MinHash-LSH candidate pairs (i < j) over text n-gram shingles:
    * signature → band hashes → explode → self-equi-join on
    * (band_id, band_hash) → distinct. Each doc is shuffled `bands`
    * times regardless of corpus size. */
  def minhashLshCandidates(docs: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, hashes: Int = 12, bands: Int = 4,
      maxBucket: Int = 0): DataFrame = {
    val banded = bandTable(docs, idCol, textCol, ngram, hashes, bands).persist(Disk)
    val out = candidatesFrom(banded, maxBucket).persist(Disk)
    out.count()            // force: candidate pairs are tiny vs the corpus
    banded.unpersist(false)
    out
  }

  /** Exact n-gram Jaccard for given (i, j) pairs, over the shingle
    * STRINGS (`array_intersect` per pair). This is the oracle-exact
    * reference form; at scale prefer [[nearDupPairs]]' fused path —
    * sorted 60-bit shingle hashes merged by a codegen'd kernel —
    * measured 43x cheaper per candidate on the sf1 tier (r18 A/B in
    * graft.tools.ProfileMinhash: 3131 vs 72 cpu-s for the same 1.15M
    * pairs). The shingle-set table is persisted only while this
    * result is being produced — callers that want the lifecycle
    * managed should go through [[nearDupPairs]]. */
  def pairJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, ngram: Int = 3): DataFrame = {
    val sets = widen(docs).select(col(idCol).as("_id"),
      shingleSet(col(textCol), ngram).as("_set")).persist(Disk)
    val out = pairJaccardWith(pairs, sets).persist(Disk)
    out.count()
    sets.unpersist(false)
    out
  }

  private[graft] def pairJaccardWith(pairs: DataFrame, sets: DataFrame): DataFrame =
    pairs
      .join(sets.select(col("_id").as("i"), col("_set").as("_sa")), "i")
      .join(sets.select(col("_id").as("j"), col("_set").as("_sb")), "j")
      .withColumn("_inter", size(array_intersect(col("_sa"), col("_sb"))).cast("double"))
      .withColumn("_union",
        (size(col("_sa")) + size(col("_sb"))).cast("double") - col("_inter"))
      .withColumn("jaccard",
        when(col("_union") > 0, col("_inter") / col("_union")).otherwise(0.0))
      .select(col("i"), col("j"), col("jaccard"))

  /** Near-dup pairs: LSH candidates verified by exact shingle Jaccard
    * >= threshold — the standard MinHash dedup pipeline. The returned
    * (small) pair set is materialized and cached; all intermediates are
    * unpersisted before returning.
    *
    * Scaling the parameters with corpus size: the false-candidate
    * tail is n²·p_false at fixed (bands, rows-per-band), so a corpus
    * decades bigger than the tuning point needs either more rows per
    * band (keep the S-curve threshold (1/bands)^(1/r) at the
    * operating point by raising bands with r) or `maxBucket` — a
    * hot-bucket cap that bounds any single bucket's O(B²) pair
    * emission regardless of why it is hot (template clusters,
    * boilerplate, adversarial spam). The r18 measured tail on THIS
    * corpus was neither: it was signature hash-space saturation,
    * fixed by widening [[graft.core.MinHashSig.M]] to 2^32-5 (see
    * that scaladoc for the measurement). */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, ngram: Int = 3, hashes: Int = 12,
      bands: Int = 4, maxBucket: Int = 0): DataFrame = {
    import org.apache.spark.sql.graft.shim
    // ONE tokenize+shingle pass feeds both the candidate join (bands)
    // and the exact-Jaccard verify; the previous bandTable + separate
    // shingleSet formulation scanned, repartitioned, and shingled the
    // corpus twice. The verify set is the doc's SORTED distinct 60-bit
    // shingle hashes — 8-byte longs through the cache and the pair
    // join instead of shingle strings, intersected by a merge pass
    // (graft.core.SortedLongIntersectK) instead of a per-row string
    // hash set.
    val base = widen(docs).select(col(idCol).as("_id"),
      minhashBandsAndHashSet(col(textCol), ngram, hashes, bands).as("_bs"))
      .persist(Disk)
    val banded = base.select(col("_id"),
      posexplode(col("_bs.bands")).as(Seq("band_id", "band_hash")))
    val cand = candidatesFrom(banded, maxBucket).persist(Disk)
    val sets = base.select(col("_id"), col("_bs.sh").as("_set"))
    val inter = shim.col(graft.core.SortedLongIntersectK(
      shim.expr(col("_sa")), shim.expr(col("_sb")))).cast("double")
    val out = cand
      .join(sets.select(col("_id").as("i"), col("_set").as("_sa")), "i")
      .join(sets.select(col("_id").as("j"), col("_set").as("_sb")), "j")
      .withColumn("_inter", inter)
      .withColumn("_union",
        (size(col("_sa")) + size(col("_sb"))).cast("double") - col("_inter"))
      .withColumn("jaccard",
        when(col("_union") > 0, col("_inter") / col("_union")).otherwise(0.0))
      .select(col("i"), col("j"), col("jaccard"))
      .filter(col("jaccard") >= threshold)
      .persist(Disk)
    out.count()            // force while intermediates are still cached
    Seq(base, cand).foreach(_.unpersist(false))
    out
  }

  /** At-scale MinHash parameter policy (VERDICT r18 #2): derive
    * (hashes, bands) from the corpus size so the expected
    * false-candidate count stays LINEAR in n at the `threshold`
    * operating point, instead of leaving rows-per-band to the caller.
    *
    * Two published formulas drive the choice (the scaladoc guidance
    * on [[nearDupPairs]], now encoded):
    *
    *  - S-curve placement: a pair at Jaccard s collides in at least
    *    one of b bands of r rows with p = 1 − (1−s^r)^b, whose
    *    half-recall midpoint sits at s* ≈ (1/b)^(1/r). Fixing
    *    s* = threshold gives b = (1/threshold)^r — bands are a
    *    FUNCTION of rows-per-band once the operating point is pinned,
    *    so raising r against noise never silently moves the recall
    *    curve off the threshold.
    *  - False-candidate control: an unrelated pair at background
    *    Jaccard s0 survives a band with p = s0^r, so the expected
    *    false candidates per doc are ≈ n · b · s0^r. The policy picks
    *    the smallest r whose expectation is ≤ `falseCandidatesPerDoc`
    *    (default 1 — total false candidates linear in the corpus, the
    *    same "true-pair line" the r18 modulus fix restored).
    *
    * r therefore grows with log(n): ~6 rows/band at 10^5 docs, 8 at
    * 10^7, 10 at 10^9 (threshold 0.8, s0 0.1 — DedupSpec pins these).
    * s0 defaults to 0.1: the measured background shingle overlap of
    * non-duplicate natural-text docs is a few percent, so 0.1 is the
    * conservative (over-provisioning) side. Signature cost is r·b
    * hashes per doc — at 10^9 docs the policy spends 90 hashes to keep
    * the candidate join linear, the right trade at 100 TB where a
    * quadratic candidate tail is fatal but signature hashing is an
    * embarrassingly-parallel map.
    *
    * The remaining knob, `maxBucket`, stays caller-owned even under
    * the auto policy: it is a RECALL trade (drops whole hot buckets),
    * appropriate only when the corpus is known to carry
    * template/boilerplate clusters — a size-derived formula cannot
    * know that. Returns (hashes, bands) with hashes = r · bands. */
  def autoMinhashParams(n: Long, threshold: Double,
      backgroundJaccard: Double = 0.1,
      falseCandidatesPerDoc: Double = 1.0): (Int, Int) = {
    require(threshold > 0.0 && threshold < 1.0,
      s"threshold must be in (0,1): $threshold")
    require(backgroundJaccard > 0.0 && backgroundJaccard < threshold,
      s"background Jaccard must be below the threshold: $backgroundJaccard")
    def bandsFor(r: Int): Int =
      math.max(1, math.round(math.pow(1.0 / threshold, r)).toInt)
    var r = 2
    while (r < 64 && n.toDouble * bandsFor(r) *
        math.pow(backgroundJaccard, r) > falseCandidatesPerDoc) r += 1
    val b = bandsFor(r)
    (r * b, b)
  }

  /** [[nearDupPairs]] with (hashes, bands) derived from the corpus
    * size by [[autoMinhashParams]] — the opt-in at-scale policy
    * (VERDICT r18 #2). One extra count() over the corpus pays for the
    * derivation; the catalog's oracle rows keep their explicit
    * parameters so published hashes never move with the policy. */
  def nearDupPairsAuto(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, ngram: Int = 3, maxBucket: Int = 0): DataFrame = {
    val (hashes, bands) = autoMinhashParams(docs.count(), threshold)
    nearDupPairs(docs, idCol, textCol, threshold, ngram, hashes, bands,
      maxBucket)
  }

  /** The corpus after near-dup removal: for every verified pair
    * (i, j), the higher id j is dropped (keep-first policy — the
    * standard LLM-training-data dedup rule; a connected-components
    * variant would union labels first). No broadcast hint on the loser
    * set: on duplicate-heavy crawls it approaches corpus size, so the
    * join strategy is left to AQE (VERDICT r02 finding #5). */
  def dropNearDups(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, ngram: Int = 3, hashes: Int = 12,
      bands: Int = 4): DataFrame =
    dropPairsLosers(docs, idCol,
      nearDupPairs(docs, idCol, textCol, threshold, ngram, hashes, bands))

  /** Keep-first removal given an already-computed verified pair set
    * (columns i, j): drops every j. Lets callers that share one
    * pipeline result across several consumers (candidate listing,
    * corpus dedup) avoid re-running the pipeline. */
  def dropPairsLosers(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = pairs.select(col("j").as(idCol)).distinct()
    docs.join(losers, Seq(idCol), "left_anti")
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
      .persist(Disk)
    var labels = ids.select(col(idCol).as("id"), col(idCol).as("component"))
      .persist(Disk)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val neighborMin = sym
        .join(labels.select(col("id").as("dst"), col("component").as("_nl")), "dst")
        .groupBy(col("src").as("id")).agg(min(col("_nl")).as("_nmin"))
      // localCheckpoint (not just persist): labels feeds two plan
      // references per round, so lineage must be CUT, not only cached —
      // otherwise the logical plan grows geometrically with iterations
      // and AQE's per-stage plan reformatting dominates wall time.
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("_nmin"), col("component")))
            .as("component"))
        .localCheckpoint()
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
    val exploded = widen(docs).select(col(idCol).as("_id"),
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

  /** SimHash near-dup candidates: LSH on 64/chunks-bit chunks of the
    * 64-bit simhash, verified by full 64-bit Hamming <= maxHamming.
    * By pigeonhole the candidate set is COMPLETE whenever
    * maxHamming < chunks (a pair within maxHamming flips fewer chunks
    * than exist, so at least one chunk matches exactly); with
    * maxHamming >= chunks it is a recall-best-effort candidate
    * generator. Grouped shuffle, no cross join. */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, chunks: Int = 4): DataFrame = {
    require(chunks > 0 && 64 % chunks == 0, "chunks must divide 64")
    val w = 64 / chunks
    val mask = if (w == 64) -1L else (1L << w) - 1
    val sh = widen(docs).select(col(idCol).as("_id"),
      graft.functions.simhash64(TextFunctions.tokenize(col(textCol))).as("_sh"))
    val chunked = sh.select(col("_id"), col("_sh"),
      posexplode(array((0 until chunks).map(c =>
        shiftrightunsigned(col("_sh"), c * w).bitwiseAND(lit(mask))): _*))
        .as(Seq("chunk_id", "chunk")))
    // verify BEFORE dedup: the Hamming check is one xor+popcount on
    // columns already in the joined row, so applying it ahead of the
    // distinct shrinks that shuffle from the full candidate
    // multiplicity (up to `chunks` hits per pair) to just the
    // qualifying pairs (r9; profiled ~3M -> ~20k distinct-input rows
    // on the planted-dup corpus)
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk_id") === col("b.chunk_id") &&
        col("a.chunk") === col("b.chunk") && col("a._id") < col("b._id"))
      .select(col("a._id").as("i"), col("b._id").as("j"),
        bit_count(col("a._sh").bitwiseXOR(col("b._sh"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Embedding near-dup pairs (cosine >= threshold).
    *
    * Default path is EXACT centroid-bucketed blocking, not a cross
    * join (VERDICT r02 finding #3): cosine >= t on L2-normalized
    * vectors is the L2 ball ||â−b̂|| <= r with r = sqrt(2−2t), so we
    * coarse-quantize the normalized corpus into `nlist` cells and each
    * point probes only cells whose centroid is within
    * r + maxRadius(cell) of it — by the triangle inequality every
    * qualifying pair shares a (probe, home-cell) edge, so the candidate
    * set is a strict superset of the answer and the final exact-cosine
    * filter keeps results identical to brute force. Each point is
    * shuffled once per probed cell (≈1–few at dedup thresholds), never
    * joined all-pairs.
    *
    * `nlist <= 0` (the default) derives the cell count from the input:
    * nlist = max(16, ceil(sqrt(n))), so cells stay O(sqrt(n)) and the
    * within-cell verify join is O(n^1.5 · fanout) WHEN THE PRUNING
    * ENGAGES — which requires the corpus to have cluster structure at
    * the threshold scale. On an ISOTROPIC corpus every pairwise
    * distance concentrates near sqrt(2)·||v||, cell max-radii stay at
    * the corpus diameter, every point probes every cell, and the
    * exact form provably degenerates to the Theta(n^2) all-pairs
    * verify (curse of dimensionality — no ball-based summary
    * separates anything; measured on the driver testdata, r16). The
    * bounded-work at-scale path that trades cross-cell pairs away BY
    * DESIGN is [[embeddingNearDupsWithinCells]] (SemDeDup). Large
    * cell counts train via [[graft.cluster.TwoLevelClustering]] —
    * constant Spark jobs regardless of nlist. `bruteForce = true`
    * keeps the O(n²) cross join for tiny inputs / oracle twins. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nlist: Int = 0, niter: Int = 4,
      seed: Long = 1234L, bruteForce: Boolean = false): DataFrame = {
    if (bruteForce) return embeddingNearDupsBrute(df, idCol, vecCol, threshold)
    import graft.functions.cosine_sim
    val (cand, assigned) =
      embeddingCandidates(df, idCol, vecCol, threshold, nlist, niter, seed)
    val out = cand
      .withColumn("cos", cosine_sim(col("_va"), col("_vb")))
      .filter(col("cos") >= threshold)
      .select(col("i"), col("j"), col("cos"))
      .persist(Disk)
    out.count()
    assigned.unpersist(false)
    out
  }

  /** Candidate pairs (i, j, _va, _vb) BEFORE the exact cosine verify —
    * package-visible so tests can assert the blocking bound (the
    * candidate count must grow sub-quadratically in n under the auto
    * nlist). Also returns the persisted assignment table; the caller
    * unpersists it after forcing downstream results. */
  private[graft] def embeddingCandidates(df: DataFrame, idCol: String,
      vecCol: String, threshold: Double, nlist: Int = 0, niter: Int = 4,
      seed: Long = 1234L): (DataFrame, DataFrame) = {
    import graft.functions.{l2sq, normalize_l2}
    val spark = df.sparkSession
    val r = math.sqrt(math.max(0.0, 2.0 - 2.0 * threshold))
    val pts = df.select(col(idCol).as("_id"), col(vecCol).as("_v"),
      normalize_l2(col(vecCol)).as("_nv"))
    val k =
      if (nlist > 0) nlist
      else math.max(16, math.ceil(math.sqrt(df.count().toDouble)).toInt)
    // coarse quantizer over the normalized vectors; flat Lloyd for
    // small k, two-level (contrib/clustering.py:24) for large
    val centroids: Array[Array[Float]] =
      if (k <= 256)
        graft.cluster.KMeans.fit(pts.select(col("_nv")), "_nv",
          graft.cluster.KMeans.Params(k = k, niter = niter, seed = seed)).centroids
      else
        graft.cluster.TwoLevelClustering.fit(pts.select(col("_nv")), "_nv", k,
          niter1 = niter, niter2 = niter, seed = seed)
    val assigned = pts
      .withColumn("_a", org.apache.spark.sql.graft.shim.col(
        graft.core.NearestCentroid(
          org.apache.spark.sql.graft.shim.expr(col("_nv")), centroids)))
      .select(col("_id"), col("_v"), col("_nv"),
        col("_a.list_no").as("list_no"), sqrt(col("_a.dist")).as("_rad"))
      .persist(Disk)
    // per-cell max radius (nlist doubles to the driver)
    val maxRad = assigned.groupBy("list_no").agg(max(col("_rad")).as("_mr"))
      .collect().map(row => row.getInt(0) -> row.getDouble(1)).toMap
    val cents = {
      import spark.implicits._
      centroids.zipWithIndex.toSeq
        .map { case (c, l) => (l, c.toSeq, maxRad.getOrElse(l, 0.0)) }
        .toDF("list_no", "_cent", "_mr")
        .select(col("list_no"), col("_cent").cast("array<float>").as("_cent"),
          col("_mr"))
    }
    // probe edges: point x → every cell l with ||x̂−c_l|| <= r + maxR_l.
    // The epsilon is float-scale (1e-6, above float32 normalization
    // rounding ~1e-7) so a pair exactly at the geometric boundary is
    // never pruned; candidates are a superset and the exact cosine
    // filter below keeps results identical to brute force.
    val probes = assigned.select(col("_id"), col("_v"), col("_nv"))
      .crossJoin(broadcast(cents))
      .filter(sqrt(l2sq(col("_nv"), col("_cent"))) <= col("_mr") + lit(r + 1e-6))
      .select(col("_id").as("i"), col("_v").as("_va"), col("list_no"))
    val cand = probes.join(
        assigned.select(col("_id").as("j"), col("_v").as("_vb"), col("list_no")),
        Seq("list_no"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"), col("_va"), col("_vb"))
    (cand, assigned)
  }

  /** SemDeDup-style WITHIN-CELL near-dup pairs (Abbas et al. 2023,
    * §3: k-means the corpus, then compare pairs only inside each
    * cluster) — the published bounded-work recipe, and the 100 TB
    * contract for this operator. [[embeddingNearDups]]'s
    * triangle-inequality probe keeps its candidates an EXACT superset
    * of the answer, but on an ISOTROPIC corpus (all pairwise
    * distances concentrate near sqrt(2)) no ball-based summary can
    * separate anything, so the exact form provably degenerates to the
    * all-pairs verify — Theta(n^2) work however well it distributes
    * (measured: the driver-testdata embeddings are isotropic, median
    * pairwise cos 0.001, and the exact form's candidate join is
    * exactly n^2 at every scale; SCALING.md carries it under the n^2
    * work model for that reason). This variant trades the cross-cell
    * pairs away BY DESIGN (exactly as the paper does): work is
    * sum(cell^2) — n^1.5 at the sqrt-occupancy default, linear at a
    * fixed occupancy — and each cell's pair block is an independent
    * task, so the one shuffle is the assignment hash. Callers pass
    * trained `centroids` (the catalog trains them once per session
    * and sidecars them for the DuckDB replay); assignment runs on the
    * RAW vector column for bit-exact float parity with the oracle —
    * pass a pre-normalized column for the paper's cosine-cell
    * contract (the catalog corpus is unit-norm already).
    *
    * Lifecycle contract (ADVICE r17): the operator eagerly runs the
    * whole pipeline and returns the verified pairs PERSISTED
    * (MEMORY_AND_DISK) — construction cost is paid here, not at the
    * caller's first action, and the CALLER owns the release: call
    * [[Dedup.release]] on the returned DataFrame when done, or a
    * long-lived session leaks the cached pair set. Intermediates
    * (the assignment) are unpersisted before returning. */
  def embeddingNearDupsWithinCells(df: DataFrame, idCol: String,
      vecCol: String, threshold: Double,
      centroids: Array[Array[Float]]): DataFrame = {
    // Persist-and-force the assignment BEFORE the self-join (the
    // embeddingCandidates idiom at embeddingCandidates above;
    // VERDICT r16 #1): without it Catalyst plans the two join sides
    // as independent subtrees, so the n·k·d NearestCentroid pass —
    // the dominant LINEAR stage at scale — runs twice and the corpus
    // is scanned four times. The shuffle_hash hint keeps the join a
    // shuffle on list_no (the one shuffle this operator is allowed)
    // instead of a whole-corpus broadcast, which is the only
    // join shape that survives 100 TB.
    val assigned = df.select(col(idCol).as("_id"), col(vecCol).as("_v"))
      .withColumn("_a", org.apache.spark.sql.graft.shim.col(
        graft.core.NearestCentroid(
          org.apache.spark.sql.graft.shim.expr(col("_v")), centroids)))
      .select(col("_id"), col("_v"), col("_a.list_no").as("list_no"))
      .persist(Disk)
    assigned.count()
    val out = assigned.as("a")
      .join(assigned.as("b").hint("shuffle_hash"),
        col("a.list_no") === col("b.list_no") && col("a._id") < col("b._id"))
      .select(col("a._id").as("i"), col("b._id").as("j"),
        graft.functions.cosine_sim(col("a._v"), col("b._v")).as("cos"))
      .filter(col("cos") >= threshold)
      .persist(Disk)
    out.count()
    assigned.unpersist(false)
    out
  }

  /** Brute-force all-pairs form (oracle twin / tiny inputs only). */
  def embeddingNearDupsBrute(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("i"), col(vecCol).as("_va"))
    val b = df.select(col(idCol).as("j"), col(vecCol).as("_vb"))
    a.crossJoin(b).filter(col("i") < col("j"))
      .withColumn("cos", graft.functions.cosine_sim(col("_va"), col("_vb")))
      .filter(col("cos") >= threshold)
      .select(col("i"), col("j"), col("cos"))
  }
}
