package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim
import graft.functions._
import graft.knn.Knn
import graft.core.{NearestCentroid, VecSumAgg}
import graft.index.IvfIndex
import graft.llm.{Dedup, Multimodal, TextFunctions => TF}

/** Catalog part: dedup (exact/minhash/simhash/embedding), text quality, corpus ops, multimodal.
  * Entry ORDER is load-bearing (Verify/Bench iterate catalog order;
  * build-timing rows precede the searches reusing their memoized
  * index), so parts concatenate in the original sequence. */
private[graft] trait CatalogLlm { this: QueriesBase =>

  protected def llmEntries: Seq[CatalogEntry] = Seq(

    // ---- LLM-pipeline operators (north star) --------------------------

    // exact dedup with instances table (IVFFlatDedup analog) on a
    // corpus with planted duplicates (embeddings unioned with an
    // id-shifted copy)
    ("exact_dedup_vectors", (s: SparkSession, dir: String) => {
      val e = emb(s, dir).select(col("vec_id"), col("embedding"))
      val doubled = e.unionByName(
        e.select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
      // ids list rendered as a comma string: the driver's comparator
      // cannot hash array-typed cells (VERDICT r02 finding #1)
      Dedup.exactDupGroups(doubled, "vec_id", col("embedding"))
        .withColumn("ids", array_join(col("ids"), ","))
    },
      Some("""WITH u AS (SELECT vec_id, embedding FROM embeddings
             |           UNION ALL SELECT vec_id + 10000, embedding FROM embeddings)
             |SELECT min(vec_id) AS rep_id, count(*) AS cnt,
             |  array_to_string(list_sort(list(vec_id)), ',') AS ids
             |FROM u GROUP BY embedding""".stripMargin)),

    // MinHash + LSH banding near-dup dedup, end-to-end (shingle ->
    // md5 minhash signature -> band hashes -> bucket join -> exact
    // Jaccard verify). The oracle replicates the identical pipeline.
    // MinHash near-dup at lineitem scale: ~300k-doc corpus (sf0.1)
    // with planted duplicates — the text-dedup path measured under
    // real load; the oracle replays the identical discrete pipeline
    // (shingle -> md5 minhash -> band join -> exact-Jaccard verify)
    // over the same corpus CTE.
    ("minhash_neardup_big", (s: SparkSession, dir: String) =>
      commentPairs(s, dir).withColumn("jaccard", round(col("jaccard"), 4)),
      Some(s"""WITH corpus AS ($commentCorpusSql),
              |${minhashChainSql("corpus")}
              |SELECT i, j, round(inter/(tot-inter), 4) AS jaccard
              |FROM jac WHERE inter/(tot-inter) >= 0.8""".stripMargin)),

    // end-to-end corpus dedup at scale: drop the keep-first losers of
    // every >=0.8 pair from the 300k-doc corpus and count survivors
    ("neardup_dedup_big", (s: SparkSession, dir: String) =>
      Dedup.dropPairsLosers(commentCorpus(s, dir), "doc_id",
        commentPairs(s, dir))
        .agg(count(lit(1)).as("n_survivors")),
      Some(s"""WITH corpus AS ($commentCorpusSql),
              |${minhashChainSql("corpus")},
              |losers AS (SELECT DISTINCT j FROM jac WHERE inter/(tot-inter) >= 0.8)
              |SELECT count(*)::BIGINT AS n_survivors
              |FROM corpus WHERE doc_id NOT IN (SELECT j FROM losers)""".stripMargin)),

    ("minhash_lsh_neardup", (s: SparkSession, dir: String) =>
      nearDups08(s, dir)
        .withColumn("jaccard", round(col("jaccard"), 4)),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
             |         THEN list_transform(t[1:len(t)-2], (x, i) -> x || ' ' || t[i+1] || ' ' || t[i+2])
             |         ELSE []::VARCHAR[] END) AS s FROM toks),
             |hs AS (SELECT doc_id, s, list_transform(s,
             |         x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 4294967291) AS hv FROM sh),
             |sig AS (SELECT doc_id, s, list_transform(range(0, 12),
             |          j -> list_aggregate(list_transform(hv,
             |            h -> (h * ((2654435761 * (j+1)) % 1000000007) + (97531 * (j+13)) % 1000000007) % 1000000007),
             |            'min')) AS sg FROM hs),
             |band AS (SELECT doc_id, b, md5(array_to_string(sg[3*b+1:3*b+3], '|')) AS bh
             |         FROM sig, range(0, 4) r(b)),
             |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
             |         FROM band a JOIN band b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id),
             |jac AS (SELECT i, j, len(list_intersect(sa.s, sb.s))::DOUBLE AS inter,
             |               (len(sa.s) + len(sb.s))::DOUBLE AS tot
             |        FROM cand JOIN sh sa ON sa.doc_id = i JOIN sh sb ON sb.doc_id = j)
             |SELECT i, j, round(inter/(tot-inter), 4) AS jaccard
             |FROM jac WHERE inter/(tot-inter) >= 0.8""".stripMargin)),

    // HOT-BUCKET-CAPPED near-dup pairs (VERDICT r17 #2's at-scale
    // knob, oracle-checked): buckets with more than maxBucket member
    // rows are DROPPED before pair expansion — one template/boilerplate
    // cluster then bounds at O(cap²) pairs instead of O(B²). cap=2
    // genuinely binds on this corpus (size-3+ buckets exist at every
    // sf), so the capped output differs from minhash_lsh_neardup and a
    // cap regression hash-mismatches.
    ("minhash_hotcap_neardup", (s: SparkSession, dir: String) =>
      Dedup.nearDupPairs(docsDf(s, dir), "doc_id", "text",
          threshold = 0.8, ngram = 3, hashes = 12, bands = 4,
          maxBucket = 2)
        .withColumn("jaccard", round(col("jaccard"), 4)),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
             |         THEN list_transform(t[1:len(t)-2], (x, i) -> x || ' ' || t[i+1] || ' ' || t[i+2])
             |         ELSE []::VARCHAR[] END) AS s FROM toks),
             |hs AS (SELECT doc_id, s, list_transform(s,
             |         x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 4294967291) AS hv FROM sh),
             |sig AS (SELECT doc_id, s, list_transform(range(0, 12),
             |          j -> list_aggregate(list_transform(hv,
             |            h -> (h * ((2654435761 * (j+1)) % 1000000007) + (97531 * (j+13)) % 1000000007) % 1000000007),
             |            'min')) AS sg FROM hs),
             |band AS (SELECT doc_id, b, md5(array_to_string(sg[3*b+1:3*b+3], '|')) AS bh
             |         FROM sig, range(0, 4) r(b)),
             |bsz AS (SELECT b, bh, count(*) AS c FROM band GROUP BY b, bh),
             |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
             |         FROM band a JOIN band b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
             |         JOIN bsz ON bsz.b = a.b AND bsz.bh = a.bh AND bsz.c <= 2),
             |jac AS (SELECT i, j, len(list_intersect(sa.s, sb.s))::DOUBLE AS inter,
             |               (len(sa.s) + len(sb.s))::DOUBLE AS tot
             |        FROM cand JOIN sh sa ON sa.doc_id = i JOIN sh sb ON sb.doc_id = j)
             |SELECT i, j, round(inter/(tot-inter), 4) AS jaccard
             |FROM jac WHERE inter/(tot-inter) >= 0.8""".stripMargin)),

    // full dedup pipeline output: the corpus after near-dup removal
    // (keep-first policy), oracle replays the whole minhash pipeline
    ("neardup_dedup_corpus", (s: SparkSession, dir: String) =>
      Dedup.dropPairsLosers(docsDf(s, dir), "doc_id", nearDups08(s, dir))
        .select(col("doc_id"), col("lang"), col("n_chars")),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
             |         THEN list_transform(t[1:len(t)-2], (x, i) -> x || ' ' || t[i+1] || ' ' || t[i+2])
             |         ELSE []::VARCHAR[] END) AS s FROM toks),
             |hs AS (SELECT doc_id, s, list_transform(s,
             |         x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 4294967291) AS hv FROM sh),
             |sig AS (SELECT doc_id, s, list_transform(range(0, 12),
             |          j -> list_aggregate(list_transform(hv,
             |            h -> (h * ((2654435761 * (j+1)) % 1000000007) + (97531 * (j+13)) % 1000000007) % 1000000007),
             |            'min')) AS sg FROM hs),
             |band AS (SELECT doc_id, b, md5(array_to_string(sg[3*b+1:3*b+3], '|')) AS bh
             |         FROM sig, range(0, 4) r(b)),
             |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
             |         FROM band a JOIN band b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id),
             |jac AS (SELECT i, j, len(list_intersect(sa.s, sb.s))::DOUBLE AS inter,
             |               (len(sa.s) + len(sb.s))::DOUBLE AS tot
             |        FROM cand JOIN sh sa ON sa.doc_id = i JOIN sh sb ON sb.doc_id = j),
             |losers AS (SELECT DISTINCT j FROM jac WHERE inter/(tot-inter) >= 0.8)
             |SELECT doc_id, lang, n_chars FROM documents
             |WHERE doc_id NOT IN (SELECT j FROM losers)""".stripMargin)),

    // near-dup connected components (the duplicate-CLUSTER view the
    // keep-first policy collapses): distributed min-label propagation
    // over the verified pair set — each iteration shuffles only the
    // edge set, never the corpus. The oracle replays the minhash chain
    // and computes min-reachable-id per doc via a recursive CTE
    // (transitive closure over the symmetric edge set — exact on the
    // shallow near-dup graph, where min-label converges long before
    // maxIter).
    ("neardup_components", (s: SparkSession, dir: String) =>
      Dedup.nearDupComponents(docsDf(s, dir).select(col("doc_id")),
          nearDups08(s, dir), "doc_id")
        .select(col("id").as("doc_id"), col("component")),
      Some(s"""WITH RECURSIVE ${minhashChainSql("documents")},
              |pairs AS (SELECT i, j FROM jac WHERE inter/(tot-inter) >= 0.8),
              |edges AS (SELECT i AS a, j AS b FROM pairs
              |          UNION ALL SELECT j AS a, i AS b FROM pairs),
              |reach(id, r) AS (
              |  SELECT doc_id, doc_id FROM documents
              |  UNION
              |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b)
              |SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id""".stripMargin)),

    // exact n-gram Jaccard via inverted shingle index (no cross join)
    ("ngram_jaccard_pairs", (s: SparkSession, dir: String) =>
      Dedup.ngramJaccardPairs(
        docsDf(s, dir).filter(col("doc_id") < 150),
        "doc_id", "text", threshold = 0.5, ngram = 3)
        .withColumn("jaccard", round(col("jaccard"), 4)),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < 150),
             |sh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) >= 3
             |         THEN list_transform(t[1:len(t)-2], (x, i) -> x || ' ' || t[i+1] || ' ' || t[i+2])
             |         ELSE []::VARCHAR[] END)) AS sh FROM toks),
             |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             |inter AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
             |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
             |SELECT i, j, round(c::DOUBLE/(na.n + nb.n - c), 4) AS jaccard
             |FROM inter JOIN sizes na ON na.doc_id = i JOIN sizes nb ON nb.doc_id = j
             |WHERE c::DOUBLE/(na.n + nb.n - c) >= 0.5""".stripMargin)),

    // Fixed-size token chunking with overlap — the unit-of-training
    // split of every LLM corpus pipeline. Narrow map per document
    // (posexplode, nothing shuffles); oracle re-derives every chunk
    // boundary and tail in SQL.
    ("chunk_documents", (s: SparkSession, dir: String) =>
      graft.llm.Corpus.chunk(docsDf(s, dir).filter(col("doc_id") < 100),
        "doc_id", "text", size = 64, overlap = 16),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < 100),
             |c AS (SELECT doc_id, t, greatest(1, ceil((len(t) - 16)::DOUBLE / 48)::INT) AS nc FROM toks),
             |e AS (SELECT doc_id, t, unnest(range(0, nc)) AS chunk_no FROM c)
             |SELECT doc_id, chunk_no::BIGINT AS chunk_no,
             |  array_to_string(t[chunk_no*48+1 : chunk_no*48+64], ' ') AS chunk_text,
             |  len(string_split(array_to_string(t[chunk_no*48+1 : chunk_no*48+64], ' '), ' '))::BIGINT AS n_tokens
             |FROM e""".stripMargin)),

    // Benchmark decontamination: corpus docs sharing any distinct
    // 3-gram with the benchmark split (doc_id % 7 == 0 stands in for
    // an eval set). Inverted shingle index equi-join, one aggregate —
    // the standard pre-training contamination sweep, never a cross
    // join.
    ("benchmark_decontaminate", (s: SparkSession, dir: String) => {
      val d = docsDf(s, dir).filter(col("doc_id") < 200)
      graft.llm.Corpus.contaminated(
        d.filter(col("doc_id") % 7 =!= 0),
        d.filter(col("doc_id") % 7 === 0),
        "doc_id", "text", ngram = 3)
    },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < 200),
             |sh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) >= 3
             |         THEN list_transform(t[1:len(t)-2], (x, i) -> x || ' ' || t[i+1] || ' ' || t[i+2])
             |         ELSE []::VARCHAR[] END)) AS sh FROM toks),
             |bsh AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 7 = 0),
             |csh AS (SELECT doc_id, sh FROM sh WHERE doc_id % 7 <> 0)
             |SELECT c.doc_id, count(DISTINCT c.sh)::BIGINT AS n_shared
             |FROM csh c JOIN bsh b ON b.sh = c.sh GROUP BY c.doc_id""".stripMargin)),

    // embedding near-dup (cosine >= 0.95) on the doubled corpus.
    // EXACT form: the triangle-inequality cell probes keep candidates
    // a strict superset of the answer, which on an ISOTROPIC corpus
    // (this testdata: median pairwise cos 0.001) provably degenerates
    // to the all-pairs verify — Theta(n^2) work however well it
    // distributes. SCALING.md carries this row under the n^2 model;
    // the bounded-work at-scale path is semantic_neardup_cells below.
    ("embedding_near_dup", (s: SparkSession, dir: String) =>
      embPairs95(s, dir).withColumn("cos", round(col("cos"), 4)),
      Some("""WITH u AS (SELECT vec_id, embedding FROM embeddings
             |           UNION ALL SELECT vec_id + 10000, embedding FROM embeddings)
             |SELECT a.vec_id AS i, b.vec_id AS j,
             |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
             |FROM u a CROSS JOIN u b
             |WHERE a.vec_id < b.vec_id
             |  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.95""".stripMargin)),

    // SemDeDup WITHIN-CELL near-dup (Abbas et al. 2023 §3: k-means
    // the corpus, then compare pairs only INSIDE each cluster) — the
    // published bounded-work recipe and the 100 TB contract for
    // embedding dedup: work = sum(cell^2) = n^1.5 at the
    // sqrt-occupancy default, one assignment-hash shuffle, per-cell
    // pair blocks as independent tasks. Cross-cell pairs are excluded
    // BY DESIGN (exactly as the paper does). The oracle replays the
    // assignment from the trained-centroid sidecar (ties on lower
    // list_no, the NearestCentroid contract) and the within-cell
    // cosine verify, so a wrong cell map or a leaked cross-cell pair
    // hash-mismatches.
    ("semantic_neardup_cells", (s: SparkSession, dir: String) =>
      cellPairs95(s, dir).withColumn("cos", round(col("cos"), 4)),
      Some(s"""WITH u AS (SELECT vec_id, embedding FROM embeddings
              |           UNION ALL SELECT vec_id + 10000, embedding FROM embeddings),
              |cent AS (SELECT list_no, c::DOUBLE[] AS c FROM read_parquet('$AUX/semcells_centroids/*.parquet')),
              |a AS (SELECT vec_id, embedding, list_no FROM (
              |  SELECT u.vec_id, u.embedding, cent.list_no,
              |    row_number() OVER (PARTITION BY u.vec_id ORDER BY
              |      list_aggregate(list_transform(list_zip(u.embedding::DOUBLE[], cent.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cent.list_no) AS rn
              |  FROM u CROSS JOIN cent) t WHERE rn = 1)
              |SELECT x.vec_id AS i, y.vec_id AS j,
              |  round(list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]), 4) AS cos
              |FROM a x JOIN a y ON x.list_no = y.list_no AND x.vec_id < y.vec_id
              |WHERE list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) >= 0.95""".stripMargin)),

    // SemDeDup-style semantic dedup (Abbas et al. 2023): one
    // representative per connected component of the >= 0.95-cosine
    // embedding near-dup graph — the cluster-then-keep-one policy, vs
    // the pairwise keep-first of neardup_dedup_corpus. Components via
    // distributed min-label propagation over the (small) verified
    // pair set; the oracle replays them with a recursive CTE.
    ("semantic_dedup", (s: SparkSession, dir: String) =>
      Dedup.nearDupComponents(doubledEmb(s, dir).select(col("vec_id")),
          embPairs95(s, dir), "vec_id")
        .select(col("component").as("vec_id")).distinct(),
      Some("""WITH RECURSIVE u AS (SELECT vec_id, embedding FROM embeddings
             |           UNION ALL SELECT vec_id + 10000, embedding FROM embeddings),
             |pairs AS (SELECT a.vec_id AS i, b.vec_id AS j
             |          FROM u a CROSS JOIN u b WHERE a.vec_id < b.vec_id
             |            AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.95),
             |edges AS (SELECT i AS a, j AS b FROM pairs
             |          UNION ALL SELECT j AS a, i AS b FROM pairs),
             |reach(id, r) AS (
             |  SELECT vec_id, vec_id FROM u
             |  UNION
             |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b)
             |SELECT DISTINCT min_r AS vec_id
             |FROM (SELECT id, min(r) AS min_r FROM reach GROUP BY id) c""".stripMargin)),

    // SemDeDup END-TO-END at-scale semantic dedup (VERDICT r16 #2):
    // the same keep-one-per-component policy as semantic_dedup, but
    // composed over the BOUNDED within-cell pair source
    // (embeddingNearDupsWithinCells, n^1.5 at sqrt-occupancy) instead
    // of the Theta(n^2) exact pair set — so the whole 100 TB dedup
    // path (assign -> within-cell verify -> components -> keep-one)
    // has no quadratic stage. Cross-cell near-dup pairs are excluded
    // BY DESIGN (the paper's trade), so components — and hence the
    // kept set — can differ from semantic_dedup's exact answer; the
    // oracle replays the sidecar assignment, the within-cell verify
    // and the min-label components with a recursive CTE, so a leaked
    // cross-cell edge or a wrong component hash-mismatches.
    ("semantic_dedup_cells", (s: SparkSession, dir: String) =>
      Dedup.nearDupComponents(doubledEmb(s, dir).select(col("vec_id")),
          cellPairs95(s, dir), "vec_id")
        .select(col("component").as("vec_id")).distinct(),
      Some(s"""WITH RECURSIVE u AS (SELECT vec_id, embedding FROM embeddings
              |           UNION ALL SELECT vec_id + 10000, embedding FROM embeddings),
              |cent AS (SELECT list_no, c::DOUBLE[] AS c FROM read_parquet('$AUX/semcells_centroids/*.parquet')),
              |a AS (SELECT vec_id, embedding, list_no FROM (
              |  SELECT u.vec_id, u.embedding, cent.list_no,
              |    row_number() OVER (PARTITION BY u.vec_id ORDER BY
              |      list_aggregate(list_transform(list_zip(u.embedding::DOUBLE[], cent.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cent.list_no) AS rn
              |  FROM u CROSS JOIN cent) t WHERE rn = 1),
              |pairs AS (SELECT x.vec_id AS i, y.vec_id AS j
              |  FROM a x JOIN a y ON x.list_no = y.list_no AND x.vec_id < y.vec_id
              |  WHERE list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) >= 0.95),
              |edges AS (SELECT i AS src, j AS dst FROM pairs
              |          UNION ALL SELECT j AS src, i AS dst FROM pairs),
              |reach(id, r) AS (
              |  SELECT vec_id, vec_id FROM u
              |  UNION
              |  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst)
              |SELECT DISTINCT min_r AS vec_id
              |FROM (SELECT id, min(r) AS min_r FROM reach GROUP BY id) c""".stripMargin)),

    // unigram-LM quality score (the CCNet/KenLM perplexity-proxy
    // filter): corpus unigram frequencies -> per-token negative log
    // likelihood -> per-doc average. Two grouped shuffles (token
    // counts, per-doc agg) + one equi-join on token — every step
    // scales like a word count. Per-token nll is snapped to an
    // INTEGER 1e-4 grid before the per-doc sum so the aggregate is a
    // long sum — exact and partition-order independent in both
    // engines (a double sum can flip a 2-dp rounding boundary under
    // AQE re-plans; ADVICE r8).
    ("unigram_logprob", (s: SparkSession, dir: String) =>
      unigramDocScores(docsDf(s, dir))
        .select(col("doc_id").cast("long").as("doc_id"),
          col("avg_nll"), col("n_tokens")),
      Some("""WITH tk AS (SELECT doc_id, tok
             |        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
             |        WHERE length(tok) > 0),
             |counts AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
             |tot AS (SELECT sum(c)::DOUBLE AS T FROM counts),
             |vocab AS (SELECT tok, CAST(round(-ln(c / T) * 10000) AS BIGINT) AS nll_i FROM counts, tot)
             |SELECT doc_id, round(sum(nll_i) / 10000.0 / count(*), 2) AS avg_nll,
             |  count(*)::BIGINT AS n_tokens
             |FROM tk JOIN vocab USING (tok) GROUP BY doc_id""".stripMargin)),

    // bigram-LM quality score (the conditional-probability step up
    // from unigram_logprob): per-doc average of
    // -ln(c(w1,w2) / c(w1·)) over adjacent token pairs. Bigrams come
    // from a NARROW zip of two array slices (no self-join on
    // position); the bigram counts are one grouped shuffle and the
    // prefix counts derive from them (sum per w1) — never a second
    // pass over the corpus. nll on the INTEGER 1e-4 grid like the
    // unigram queries, so the per-doc sum is exact.
    ("bigram_logprob", (s: SparkSession, dir: String) => {
      val toksArr = filter(TF.tokenize(col("text")), t => length(t) > 0)
      val bigrams = docsDf(s, dir)
        .select(col("doc_id"), toksArr.as("_t"))
        .filter(size(col("_t")) >= 2)
        .select(col("doc_id"), explode(zip_with(
          slice(col("_t"), lit(1), size(col("_t")) - 1),
          slice(col("_t"), lit(2), size(col("_t")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("_bg"))
        .select(col("doc_id"), col("_bg.w1").as("w1"), col("_bg.w2").as("w2"))
      val c12 = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      val c1 = c12.groupBy(col("w1")).agg(sum(col("c")).as("c1"))
      val prob = c12.join(c1, "w1")
        .select(col("w1"), col("w2"),
          round(-log(col("c") / col("c1")) * 10000).cast("long").as("nll_i"))
      bigrams.join(prob, Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(round(sum(col("nll_i")) / 10000.0 / count(lit(1)), 2).as("avg_nll"),
          count(lit(1)).as("n_bigrams"))
    },
      Some("""WITH tk AS (SELECT doc_id,
             |    list_filter(string_split(text, ' '), t -> length(t) > 0) AS t
             |  FROM documents),
             |bg AS (SELECT doc_id,
             |    unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
             |  FROM tk WHERE len(t) >= 2),
             |c12 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2),
             |c1 AS (SELECT w1, sum(c) AS c1 FROM c12 GROUP BY w1),
             |prob AS (SELECT c12.w1, c12.w2,
             |    CAST(round(-ln(c / c1) * 10000) AS BIGINT) AS nll_i
             |  FROM c12 JOIN c1 USING (w1))
             |SELECT doc_id, round(sum(nll_i) / 10000.0 / count(*), 2) AS avg_nll,
             |  count(*)::BIGINT AS n_bigrams
             |FROM bg JOIN prob USING (w1, w2) GROUP BY doc_id""".stripMargin)),

    // unigram-LM scoring at scale: the same pipeline over the 300k-doc
    // derived corpus — 3.6M token rows through the vocab aggregate and
    // the token equi-join (the word-count shape the filter has at
    // 100 TB). The 300k per-doc scores are folded to their 2-dp
    // histogram so the compared result stays small while every
    // upstream row is real.
    ("unigram_logprob_big", (s: SparkSession, dir: String) =>
      unigramDocScores(commentCorpus(s, dir))
        .groupBy(col("avg_nll"))
        .agg(count(lit(1)).as("n_docs")),
      Some(s"""WITH corpus AS ($commentCorpusSql),
              |tk AS (SELECT doc_id, tok
              |        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM corpus) t
              |        WHERE length(tok) > 0),
              |counts AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
              |tot AS (SELECT sum(c)::DOUBLE AS T FROM counts),
              |vocab AS (SELECT tok, CAST(round(-ln(c / T) * 10000) AS BIGINT) AS nll_i FROM counts, tot),
              |scored AS (SELECT doc_id, round(sum(nll_i) / 10000.0 / count(*), 2) AS avg_nll
              |           FROM tk JOIN vocab USING (tok) GROUP BY doc_id)
              |SELECT avg_nll, count(*)::BIGINT AS n_docs FROM scored GROUP BY avg_nll""".stripMargin)),

    // TF-IDF keyword extraction: top-3 terms per document by
    // tf·ln(N/df), ranked on the 2-dp-rounded weight with a lexical
    // tie-break so near-equal weights order identically in both
    // engines. Term and document frequencies are grouped shuffles;
    // the corpus size joins in as a broadcast scalar.
    ("tfidf_top_terms", (s: SparkSession, dir: String) => {
      val toks = docsDf(s, dir)
        .select(col("doc_id"), explode(TF.tokenize(col("text"))).as("tok"))
        .filter(length(col("tok")) > 0)
      val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val n = docsDf(s, dir).agg(count(lit(1)).as("N"))
      val w = tf.join(dfreq, "tok").crossJoin(broadcast(n))
        .withColumn("w", round(col("tf") * log(col("N") / col("df")), 2))
      import org.apache.spark.sql.expressions.Window
      w.withColumn("rank", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("w").desc, col("tok").asc)).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("tok"), col("w"))
    },
      Some("""WITH tk AS (SELECT doc_id, tok
             |        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
             |        WHERE length(tok) > 0),
             |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY doc_id, tok),
             |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
             |n AS (SELECT count(*)::DOUBLE AS N FROM documents),
             |w AS (SELECT doc_id, tok, round(tf * ln(N / df), 2) AS w
             |      FROM tf JOIN dfreq USING (tok), n)
             |SELECT doc_id, "rank", tok, w FROM (
             |  SELECT doc_id, tok, w,
             |    row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, tok ASC) AS "rank"
             |  FROM w) r
             |WHERE "rank" <= 3""".stripMargin)),

    // simhash near-dup pairs over a corpus with planted exact
    // duplicates. 8 chunks of 8 bits with maxHamming=7 make the
    // chunk-LSH candidate set COMPLETE by pigeonhole, so the sidecar
    // oracle (engine-computed 64-bit codes, then an independent
    // all-pairs xor/popcount in SQL) must agree exactly — this checks
    // that the bucketed pipeline loses no pair vs brute force.
    ("simhash_neardup", (s: SparkSession, dir: String) =>
      Dedup.simhashNearDups(
        simhashCorpus(s, dir), "doc_id", "text",
        maxHamming = 7, chunks = 8),
      Some(s"""WITH c AS (SELECT cid, code FROM read_parquet('$AUX/simhash_codes/*.parquet'))
              |SELECT a.cid AS i, b.cid AS j,
              |  bit_count(xor(a.code, b.code))::BIGINT AS hamming
              |FROM c a JOIN c b ON a.cid < b.cid
              |WHERE bit_count(xor(a.code, b.code)) <= 7""".stripMargin)),

    // text analysis: token/char counts
    ("token_count", (s: SparkSession, dir: String) =>
      docsDf(s, dir).select(
        col("doc_id"), TF.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).cast("long").as("len_chars")),
      Some("""SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens,
             |  length(text)::BIGINT AS len_chars FROM documents""".stripMargin)),

    // CCNet-style line-level boilerplate removal: per-line document
    // frequency across the corpus -> drop lines above the df
    // threshold -> ordered reassembly. Both sides SEED each document
    // with a corpus-wide 8-token header and a per-source 8-token
    // footer (the corpus has no natural boilerplate), so the header
    // always crosses the threshold and the footers sit near it — the
    // one hash shuffle on the line is the shape this op has at 100 TB.
    ("boilerplate_removal", (s: SparkSession, dir: String) => {
      val seeded = docsDf(s, dir).select(col("doc_id"),
        concat(lit("this document is provided under the standard disclaimer "),
          lit("footer of source "), col("source"),
          lit(" applies to every document "), col("text")).as("t"))
      graft.llm.Corpus.dropBoilerplate(seeded, "doc_id", "t",
        window = 8, maxDfFrac = 0.04)
        .withColumnRenamed("id", "doc_id")
    },
      Some("""WITH seeded AS (SELECT doc_id,
             |  concat('this document is provided under the standard disclaimer ',
             |         'footer of source ', source, ' applies to every document ', text) AS t
             |  FROM documents),
             |toks AS (SELECT doc_id, string_split(t, ' ') AS t FROM seeded),
             |c AS (SELECT doc_id, t, ceil(len(t)::DOUBLE / 8)::INT AS nl FROM toks),
             |lines AS (SELECT doc_id, unnest(range(0, nl)) AS pos, t FROM c),
             |lv AS (SELECT doc_id, pos, array_to_string(t[pos*8+1 : pos*8+8], ' ') AS line FROM lines),
             |dfc AS (SELECT line, count(DISTINCT doc_id) AS df FROM lv GROUP BY line),
             |nd AS (SELECT count(*)::DOUBLE AS n FROM seeded),
             |dropped AS (SELECT line FROM dfc, nd WHERE df > greatest(1.0, 0.04 * n)),
             |agg AS (SELECT l.doc_id, count(*)::BIGINT AS n_lines,
             |    sum(CASE WHEN d.line IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
             |    md5(coalesce(string_agg(CASE WHEN d.line IS NULL THEN l.line END, ' ' ORDER BY l.pos), '')) AS kept_md5
             |  FROM lv l LEFT JOIN dropped d ON d.line = l.line GROUP BY l.doc_id)
             |SELECT doc_id, n_lines, n_dropped, kept_md5 FROM agg""".stripMargin)),

    // PII redaction — the standard pre-training scrub pass (emails,
    // phone numbers, IPv4 literals -> type tags). The synthetic corpus
    // carries no PII, so both sides SEED each document with
    // deterministic doc_id-derived PII first (the planted-duplicates
    // convention of simhashCorpus), then redact: match counts and the
    // md5 of the redacted text must agree, which gates the identical
    // RE2-subset regexes through Spark's codegen'd regexp engine and
    // the oracle's. Per-row projection, no shuffle — the 100 TB shape.
    ("pii_redact", (s: SparkSession, dir: String) => {
      val seeded = docsDf(s, dir).select(col("doc_id"),
        concat(lit("email u"), col("doc_id").cast("string"),
          lit("@ex"), pmod(col("doc_id"), lit(7)).cast("string"),
          lit(".com tel 555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" ip 10.1."), pmod(col("doc_id"), lit(256)).cast("string"),
          lit("."), pmod(col("doc_id") * 7, lit(256)).cast("string"),
          lit(" "), col("text")).as("t"))
      seeded.select(col("doc_id"),
        TF.piiCount(col("t")).cast("long").as("n_pii"),
        md5(TF.redactPii(col("t"))).as("redacted_md5"))
    },
      Some(s"""WITH seeded AS (SELECT doc_id,
              |  concat('email u', doc_id, '@ex', doc_id % 7, '.com tel 555-',
              |         lpad((doc_id % 10000)::VARCHAR, 4, '0'),
              |         ' ip 10.1.', doc_id % 256, '.', (doc_id*7) % 256, ' ', text) AS t
              |  FROM documents)
              |SELECT doc_id,
              |  (len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
              |   + len(regexp_extract_all(t, '\\b555-[0-9]{4}\\b'))
              |   + len(regexp_extract_all(t, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')))::BIGINT AS n_pii,
              |  md5(regexp_replace(regexp_replace(regexp_replace(t,
              |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
              |    '\\b555-[0-9]{4}\\b', '[PHONE]', 'g'),
              |    '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '[IP]', 'g')) AS redacted_md5
              |FROM seeded""".stripMargin)),

    // quality signal: within-document 3-gram repetition ratio (the
    // C4/Dolma-style repetitive-text filter) — built-in array
    // functions only, stays inside whole-stage codegen
    ("repetition_ratio", (s: SparkSession, dir: String) => {
      val toks = TF.tokenize(col("text"))
      val n = size(toks)
      val grams = transform(sequence(lit(1), n - 2),
        i => concat_ws(" ", slice(toks, i, lit(3))))
      val total = (n - 2).cast("double")
      docsDf(s, dir).select(col("doc_id"),
        when(n >= 3,
          round((total - size(array_distinct(grams)).cast("double")) / total, 4))
          .otherwise(lit(0.0)).as("rep_ratio"))
    },
      Some("""SELECT doc_id,
             |  CASE WHEN len(tk) >= 3
             |    THEN round(((len(tk)-2) - len(list_distinct(g))) / (len(tk)-2)::DOUBLE, 4)
             |    ELSE 0.0 END AS rep_ratio
             |FROM (SELECT doc_id, tk,
             |        list_transform(generate_series(1, len(tk)-2),
             |                       i -> array_to_string(tk[i:i+2], ' ')) AS g
             |      FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) t) u""".stripMargin)),

    // corpus statistics: exact vocabulary size per language (distinct
    // whitespace tokens) — the shuffle is on (lang, token) with
    // map-side partial distinct, so it scales like any groupBy
    ("vocab_size", (s: SparkSession, dir: String) =>
      docsDf(s, dir)
        .select(col("lang"), explode(TF.tokenize(col("text"))).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy(col("lang"))
        .agg(countDistinct(col("tok")).as("vocab"), count(lit(1)).as("total_tokens")),
      Some("""SELECT lang, count(DISTINCT tok)::BIGINT AS vocab, count(*)::BIGINT AS total_tokens
             |FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents) t
             |WHERE length(tok) > 0 GROUP BY lang""".stripMargin)),

    // corpus statistics: exact length quantiles per source (median +
    // p90 of n_chars, linear interpolation in both engines)
    ("length_quantiles", (s: SparkSession, dir: String) =>
      docsDf(s, dir).groupBy(col("source")).agg(
        round(expr("percentile(n_chars, 0.5)"), 2).as("p50"),
        round(expr("percentile(n_chars, 0.9)"), 2).as("p90"),
        count(lit(1)).as("n_docs")),
      Some("""SELECT source, round(quantile_cont(n_chars, 0.5), 2) AS p50,
             |  round(quantile_cont(n_chars, 0.9), 2) AS p90, count(*) AS n_docs
             |FROM documents GROUP BY source""".stripMargin)),

    // text analysis: quality scoring (length/stopword/token-length)
    ("quality_score", (s: SparkSession, dir: String) =>
      docsDf(s, dir).select(
        col("doc_id"),
        round(TF.avgTokenLength(col("text")), 4).as("avg_tok_len"),
        round(TF.stopwordRatio(col("text"), TF.EnStopwords), 4).as("sw_ratio"),
        round(TF.qualityScore(col("text"), TF.EnStopwords), 4).as("score")),
      Some("""SELECT doc_id,
             |  round(list_aggregate(list_transform(t, x -> length(x)), 'sum')::DOUBLE / len(t), 4) AS avg_tok_len,
             |  round(len(list_filter(t, x -> list_contains(['the','a','of','and','to','in','is','on'], x)))::DOUBLE / len(t), 4) AS sw_ratio,
             |  round((least(length(text)::DOUBLE / 500.0, 1.0)
             |    + least(5.0 * len(list_filter(t, x -> list_contains(['the','a','of','and','to','in','is','on'], x)))::DOUBLE / len(t), 1.0)
             |    + CASE WHEN list_aggregate(list_transform(t, x -> length(x)), 'sum')::DOUBLE / len(t) <= 8.0 THEN 1.0 ELSE 0.5 END) / 3.0, 4) AS score
             |FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents) d""".stripMargin)),

    // text analysis: stopword-based language-ID heuristic
    ("langid_stopwords", (s: SparkSession, dir: String) => {
      val ratio = TF.stopwordRatio(col("text"), TF.EnStopwords)
      docsDf(s, dir).select(
        col("doc_id"), round(ratio, 4).as("en_ratio"),
        when(ratio > 0.02, "en").otherwise("und").as("pred"))
    },
      Some("""SELECT doc_id, round(r, 4) AS en_ratio,
             |  CASE WHEN r > 0.02 THEN 'en' ELSE 'und' END AS pred
             |FROM (SELECT doc_id,
             |        len(list_filter(string_split(text, ' '), x -> list_contains(['the','a','of','and','to','in','is','on'], x)))::DOUBLE
             |          / len(string_split(text, ' ')) AS r
             |      FROM documents) t""".stripMargin)),

    // document fingerprinting (content hash)
    ("fingerprint_md5", (s: SparkSession, dir: String) =>
      docsDf(s, dir)
        .select(col("doc_id"), TF.fingerprint(col("text")).as("fp")),
      Some("SELECT doc_id, md5(text) AS fp FROM documents")),

    // document fingerprinting, ROLLING-hash variant (winnowing, MOSS —
    // Schleimer/Wilkerson/Aiken SIGMOD'03): Rabin-Karp rolling hashes
    // of every 8-char window (base 256 mod 2^31−1, maintained
    // incrementally), then the rightmost-min of each 4-hash sliding
    // window. Local + position-aware, so matches of length >= 11 share
    // a fingerprint — the plagiarism/provenance complement of the
    // whole-content hash above. The oracle recomputes the exact
    // integers (2^31 ≡ 1 mod p makes the window constants powers of
    // two) and replays the winnow as a rightmost-min row_number.
    ("winnow_fingerprints", (s: SparkSession, dir: String) =>
      docsDf(s, dir).select(col("doc_id"),
        explode(shim.col(graft.core.WinnowFingerprints(
          shim.expr(col("text")), 8, 4))).as("_f"))
        .select(col("doc_id"), col("_f.pos").cast("long").as("pos"),
          col("_f.fp").as("fp")),
      Some("""WITH cst AS (SELECT [33554432, 131072, 512, 2, 16777216, 65536, 256, 1]::BIGINT[] AS c),
             |ppos AS (SELECT doc_id, text, unnest(range(1, length(text) - 8 + 2)) AS pos FROM documents),
             |h AS (SELECT doc_id, pos,
             |    (list_aggregate(list_transform(range(0, 8),
             |      j -> ord(substring(text, (pos + j)::INT, 1)) * cst.c[(j + 1)::INT]), 'sum')
             |      % 2147483647)::BIGINT AS fp
             |  FROM ppos, cst),
             |nh AS (SELECT doc_id, unnest(range(1, count(*) - 4 + 2)) AS t
             |  FROM h GROUP BY doc_id),
             |sel AS (SELECT DISTINCT doc_id, pos, fp FROM (
             |    SELECT h.doc_id, nh.t, h.pos, h.fp,
             |      row_number() OVER (PARTITION BY h.doc_id, nh.t ORDER BY h.fp, h.pos DESC) AS rn
             |    FROM nh JOIN h ON h.doc_id = nh.doc_id AND h.pos BETWEEN nh.t AND nh.t + 3) x
             |  WHERE rn = 1)
             |SELECT doc_id, pos, fp FROM sel""".stripMargin)),

    // cross-document copied-span detection: two docs share a winnow
    // fingerprint iff they share a character span of length >= 11
    // (w + k - 1 = 4 + 8 - 1), so counting shared distinct
    // fingerprints per pair finds copied passages — the
    // provenance/contamination complement of whole-doc near-dup. The
    // inverted fingerprint index is an equi-join with a max-df cap on
    // hot fingerprints (the ngramJaccardPairs skew guard): no
    // all-pairs work at any scale.
    ("winnow_shared_spans", (s: SparkSession, dir: String) => {
      val fps = docsDf(s, dir).filter(col("doc_id") < 150)
        .select(col("doc_id"), explode(shim.col(graft.core.WinnowFingerprints(
          shim.expr(col("text")), 8, 4))).as("_f"))
        .select(col("doc_id"), col("_f.fp").as("fp")).distinct()
      val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("_df"))
        .filter(col("_df") <= 20)
      val pruned = fps.join(rare.select("fp"), "fp")
      pruned.select(col("fp"), col("doc_id").as("i"))
        .join(pruned.select(col("fp"), col("doc_id").as("j")), "fp")
        .filter(col("i") < col("j"))
        .groupBy(col("i"), col("j")).agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 2)
    },
      Some("""WITH cst AS (SELECT [33554432, 131072, 512, 2, 16777216, 65536, 256, 1]::BIGINT[] AS c),
             |docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 150),
             |ppos AS (SELECT doc_id, text, unnest(range(1, length(text) - 8 + 2)) AS pos FROM docs),
             |h AS (SELECT doc_id, pos,
             |    (list_aggregate(list_transform(range(0, 8),
             |      j -> ord(substring(text, (pos + j)::INT, 1)) * cst.c[(j + 1)::INT]), 'sum')
             |      % 2147483647)::BIGINT AS fp
             |  FROM ppos, cst),
             |nh AS (SELECT doc_id, unnest(range(1, count(*) - 4 + 2)) AS t
             |  FROM h GROUP BY doc_id),
             |sel AS (SELECT DISTINCT doc_id, fp FROM (
             |    SELECT h.doc_id, nh.t, h.pos, h.fp,
             |      row_number() OVER (PARTITION BY h.doc_id, nh.t ORDER BY h.fp, h.pos DESC) AS rn
             |    FROM nh JOIN h ON h.doc_id = nh.doc_id AND h.pos BETWEEN nh.t AND nh.t + 3) x
             |  WHERE rn = 1),
             |rare AS (SELECT fp FROM sel GROUP BY fp HAVING count(*) <= 20)
             |SELECT a.doc_id AS i, b.doc_id AS j, count(*)::BIGINT AS shared
             |FROM sel a JOIN rare USING (fp) JOIN sel b ON b.fp = a.fp AND a.doc_id < b.doc_id
             |GROUP BY i, j HAVING count(*) >= 2""".stripMargin)),

    // deterministic content-hash corpus split (train/val): the
    // split of every production corpus pipeline — stable under
    // re-sharding and re-ingestion because it keys on content
    // identity, not row order. Output: per-(lang, split) counts.
    ("corpus_split", (s: SparkSession, dir: String) =>
      docsDf(s, dir)
        .select(col("lang"),
          when(pmod(TF.fingerprint60(col("doc_id").cast("string")), lit(10)) < 9,
            "train").otherwise("val").as("split"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs")),
      Some("""SELECT lang,
             |  CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10 < 9
             |    THEN 'train' ELSE 'val' END AS split,
             |  count(*)::BIGINT AS n_docs
             |FROM documents GROUP BY lang, split""".stripMargin)),

    // Sequence packing (the concat-and-chop batching step of every
    // GPT-style pretraining pipeline): documents concatenate in a
    // deterministic content-hash order and chop into fixed
    // context-length sequences; each doc belongs to the sequence its
    // START offset falls in. Packing is PER HASH BUCKET, not global —
    // a global order would need a full sort at 100 TB, while bucketed
    // packing is a window over each bucket's partition (16 parallel
    // prefix sums here, thousands on a cluster). Output = per-sequence
    // doc count and token fill, the packing-efficiency stats.
    ("sequence_packing", (s: SparkSession, dir: String) => {
      import org.apache.spark.sql.expressions.Window
      val ctx = 512
      val toks = docsDf(s, dir).select(col("doc_id"),
        TF.tokenCount(col("text")).as("n_tok"),
        TF.fingerprint60(col("doc_id").cast("string")).as("_h"))
        .withColumn("bucket", pmod(col("_h"), lit(16)))
      val w = Window.partitionBy("bucket").orderBy(col("_h"), col("doc_id"))
      toks
        .withColumn("_end", sum(col("n_tok")).over(w))
        .withColumn("seq_id",
          floor((col("_end") - col("n_tok")) / ctx).cast("long"))
        .groupBy(col("bucket"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_sum"))
    },
      Some("""WITH t AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tok,
             |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h FROM documents),
             |b AS (SELECT doc_id, n_tok, h, h % 16 AS bucket FROM t),
             |c AS (SELECT bucket, n_tok,
             |    sum(n_tok) OVER (PARTITION BY bucket ORDER BY h, doc_id
             |                     ROWS UNBOUNDED PRECEDING) AS e FROM b),
             |p AS (SELECT bucket, n_tok, ((e - n_tok) // 512)::BIGINT AS seq_id FROM c)
             |SELECT bucket, seq_id, count(*)::BIGINT AS n_docs,
             |  sum(n_tok)::BIGINT AS tok_sum
             |FROM p GROUP BY bucket, seq_id""".stripMargin)),

    // Stratified (topic-balanced) corpus sampling — the cluster-then-
    // cap resampling step of large-scale dataset curation: k-means
    // clusters over the embedding column, then a deterministic
    // content-hash cap per cluster (keep iff hash(id) mod n_c < cap,
    // expected cap rows/cluster; clusters under the cap keep all).
    // At 100 TB this is a map-side assign expression + a hash filter —
    // no shuffle beyond the 8-row size/stat aggregates. id_sum is the
    // integer-exact witness of the exact kept SET. The oracle replays
    // assignment from the centroid sidecar, the per-cluster counts,
    // and the same md5-hash cap.
    ("corpus_stratified_sample", (s: SparkSession, dir: String) => {
      val m = km8(s, dir)
      val assigned = m.assign(
        emb(s, dir).select(col("vec_id"), col("embedding")), "embedding")
        .select(col("vec_id"), col("list_no"))
      val sizes = assigned.groupBy("list_no")
        .agg(count(lit(1)).as("n_total"))
      val keep = pmod(TF.fingerprint60(col("vec_id").cast("string")),
        col("n_total")) < lit(40)
      assigned.join(broadcast(sizes), "list_no")
        .groupBy(col("list_no"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
          sum(when(keep, col("vec_id")).otherwise(0L)).as("id_sum"))
    },
      Some(s"""WITH cent AS (SELECT list_no, c::DOUBLE[] AS c FROM read_parquet('$AUX/kmeans8_centroids/*.parquet')),
              |a AS (SELECT vec_id, list_no FROM (
              |  SELECT e.vec_id, c.list_no, row_number() OVER (PARTITION BY e.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(e.embedding::DOUBLE[], c.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings e CROSS JOIN cent c) t WHERE rn = 1),
              |sz AS (SELECT list_no, count(*)::BIGINT AS n_total FROM a GROUP BY list_no),
              |k AS (SELECT a.vec_id, a.list_no, sz.n_total,
              |    (('0x' || substr(md5(a.vec_id::VARCHAR), 1, 15))::BIGINT % sz.n_total) < 40 AS keep
              |  FROM a JOIN sz USING (list_no))
              |SELECT list_no, count(*)::BIGINT AS n_total,
              |  sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
              |  sum(CASE WHEN keep THEN vec_id ELSE 0 END)::BIGINT AS id_sum
              |FROM k GROUP BY list_no""".stripMargin)),

    // multimodal: opaque binary column -> batched mapPartitions decode
    // (stub) -> typed features; oracle checks the byte-derived fields
    ("multimodal_features", (s: SparkSession, dir: String) => {
      val media = docsDf(s, dir).select(
        col("doc_id").as("id"), col("text").cast("binary").as("media"),
        lit("text-as-image").as("kind"))
      Multimodal.extractFeatures(media)
        .select(col("id"), col("n_bytes"), col("f_first"), col("f_last"))
    },
      Some("""SELECT doc_id AS id, octet_length(text::BLOB)::BIGINT AS n_bytes,
             |  ascii(substr(text, 1, 1))::DOUBLE AS f_first,
             |  ascii(substr(text, -1, 1))::DOUBLE AS f_last
             |FROM documents""".stripMargin)),
  )
}
