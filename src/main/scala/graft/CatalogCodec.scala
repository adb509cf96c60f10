package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim
import graft.functions._
import graft.knn.Knn
import graft.core.{NearestCentroid, VecSumAgg}
import graft.index.IvfIndex
import graft.llm.{Dedup, Multimodal, TextFunctions => TF}

/** Catalog part: SQ/fp16/minmax codecs, transforms, factory, PQ + fast-scan families.
  * Entry ORDER is load-bearing (Verify/Bench iterate catalog order;
  * build-timing rows precede the searches reusing their memoized
  * index), so parts concatenate in the original sequence. */
private[graft] trait CatalogCodec { this: QueriesBase =>

  /** The rq4fs_rescale_search oracle, shared verbatim by the
    * fastscan_io_roundtrip entry (a loaded index must replay the
    * SCALED integer chain bit for bit). */
  private lazy val rq4fsRescaleSql: String =
    s"""WITH cb AS (SELECT m, j, c FROM read_parquet('$AUX/rq4fsrs_codebooks/*.parquet')),
              |codes AS (SELECT id, codes FROM read_parquet('$AUX/rq4fsrs_codes/*.parquet')),
              |ncb AS (SELECT l, j, c FROM read_parquet('$AUX/rq4fsrs_normcb/*.parquet')),
              |ns AS (SELECT ns FROM read_parquet('$AUX/rq4fsrs_normscale/*.parquet')),
              |dec AS (SELECT codes.id, codes.codes,
              |    list_transform(list_zip(c0.c, c1.c), p -> p[1] + p[2]) AS dv
              |  FROM codes JOIN cb c0 ON c0.m = 0 AND c0.j = codes.codes[1]
              |  JOIN cb c1 ON c1.m = 1 AND c1.j = codes.codes[2]),
              |nb AS (SELECT id, codes,
              |    list_aggregate(list_transform(dv::DOUBLE[], x -> x*x), 'sum') AS nv FROM dec),
              |n1 AS (SELECT id, codes, nv, j AS j1, c AS c1 FROM (
              |  SELECT nb.id, nb.codes, nb.nv, ncb.j, ncb.c,
              |    row_number() OVER (PARTITION BY nb.id ORDER BY abs(nb.nv - ncb.c), ncb.j) AS rn
              |  FROM nb JOIN ncb ON ncb.l = 0) t WHERE rn = 1),
              |n2 AS (SELECT id, codes, j1, j AS j2 FROM (
              |  SELECT n1.id, n1.codes, n1.j1, ncb.j,
              |    row_number() OVER (PARTITION BY n1.id ORDER BY abs((n1.nv - n1.c1) - ncb.c), ncb.j) AS rn
              |  FROM n1 JOIN ncb ON ncb.l = 1) t WHERE rn = 1),
              |enc AS (SELECT id, 0 AS m, codes[1] AS j FROM n2
              |  UNION ALL SELECT id, 1, codes[2] FROM n2
              |  UNION ALL SELECT id, 2, j1 FROM n2
              |  UNION ALL SELECT id, 3, j2 FROM n2),
              |lut AS (SELECT q.vec_id AS qid, cb.m, cb.j,
              |    -2 * list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], cb.c::DOUBLE[]), p -> p[1]*p[2]), 'sum') AS pd
              |  FROM embeddings q CROSS JOIN cb WHERE q.vec_id < 10
              |  UNION ALL
              |  SELECT q.vec_id AS qid, 2 + ncb.l AS m, ncb.j, ncb.c / (SELECT ns FROM ns) AS pd
              |  FROM embeddings q CROSS JOIN ncb WHERE q.vec_id < 10),
              |colstat AS (SELECT qid, m, min(pd) AS mn, max(pd) - min(pd) AS span FROM lut GROUP BY qid, m),
              |scal AS (SELECT qid, 255.0 / max(span) AS a,
              |    list_aggregate(list(mn ORDER BY m), 'sum') AS b FROM colstat GROUP BY qid),
              |lq AS (SELECT l.qid, l.m, l.j, floor((l.pd - cs.mn) * sc.a + 0.5)::BIGINT AS lq
              |  FROM lut l JOIN colstat cs ON cs.qid = l.qid AND cs.m = l.m
              |  JOIN scal sc ON sc.qid = l.qid),
              |qn AS (SELECT vec_id AS qid,
              |    list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum') AS qn
              |  FROM embeddings WHERE vec_id < 10),
              |acc AS (SELECT l.qid, e.id,
              |    sum(CASE WHEN l.m >= 2 THEN l.lq * (SELECT ns FROM ns) ELSE l.lq END)::BIGINT AS qdist
              |  FROM enc e JOIN lq l ON l.m = e.m AND l.j = e.j GROUP BY l.qid, e.id)
              |SELECT w.qid, "rank", id, qdist, round(qn.qn + qdist / sc.a + sc.b, 4) AS dist FROM (
              |  SELECT qid, id, qdist, row_number() OVER (PARTITION BY qid ORDER BY qdist, id) AS "rank" FROM acc) w
              |JOIN scal sc ON sc.qid = w.qid JOIN qn ON qn.qid = w.qid
              |WHERE "rank" <= 10""".stripMargin

  protected def codecEntries: Seq[CatalogEntry] = Seq(

    // §2.11/§2.8 SQ8 codec: train (per-dim min/max) + encode + decode;
    // oracle reproduces the codec arithmetic in SQL
    ("sq8_roundtrip", (s: SparkSession, dir: String) => {
      val e = emb(s, dir)
      val sq = graft.index.SqIndex.build(e, "vec_id", "embedding")
      sq.reconstruct
        .join(e.select(col("vec_id").as("id"), col("embedding")), "id")
        .select(col("id"), round(element_at(col("vec"), 1), 4).as("d1"),
          round(aggregate(
            zip_with(col("embedding").cast("array<double>"), col("vec"),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x), 4).as("err"))
    },
      Some("""WITH dims AS (
             |  SELECT list(mn ORDER BY i) AS vmn, list(mx - mn ORDER BY i) AS vd FROM (
             |    SELECT i, min(e) AS mn, max(e) AS mx
             |    FROM (SELECT unnest(embedding::DOUBLE[]) AS e, generate_subscripts(embedding, 1) AS i
             |          FROM embeddings) u GROUP BY i) t),
             |dec AS (SELECT vec_id AS id, embedding,
             |  list_transform(embedding::DOUBLE[], (x, i) ->
             |    vmn[i] + (floor(255 * (CASE WHEN vd[i] = 0 THEN 0
             |      ELSE least(greatest((x - vmn[i]) / vd[i], 0), 1) END)) + 0.5) / 255 * vd[i]) AS dv
             |  FROM embeddings, dims)
             |SELECT id, round(dv[1], 4) AS d1,
             |  round(list_aggregate(list_transform(list_zip(embedding::DOUBLE[], dv),
             |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), 4) AS err
             |FROM dec""".stripMargin)),

    // §2.11/§2.8 SQ8 with the RS_meanstd range statistic
    // (faiss/impl/ScalarQuantizer.h:46: [mean - std·rs, mean + std·rs],
    // per-dimension via train_NonUniform). The oracle reads the trained
    // per-dim range from the sq_meanstd_range sidecar and replays
    // encode + decode + reconstruction error — same pattern as
    // kmeans_train (trained state dumped, arithmetic re-derived).
    ("sq8_meanstd_roundtrip", (s: SparkSession, dir: String) => {
      val e = emb(s, dir)
      val sq = sqMeanstd(s, dir)
      sq.reconstruct
        .join(e.select(col("vec_id").as("id"), col("embedding")), "id")
        .select(col("id"), round(element_at(col("vec"), 1), 4).as("d1"),
          round(aggregate(
            zip_with(col("embedding").cast("array<double>"), col("vec"),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x), 4).as("err"))
    },
      Some(s"""WITH dims AS (
              |  SELECT list(vmn ORDER BY i) AS vmn, list(vd ORDER BY i) AS vd
              |  FROM read_parquet('$AUX/sq_meanstd_range/*.parquet')),
              |dec AS (SELECT vec_id AS id, embedding,
              |  list_transform(embedding::DOUBLE[], (x, i) ->
              |    vmn[i] + (floor(255 * (CASE WHEN vd[i] = 0 THEN 0
              |      ELSE least(greatest((x - vmn[i]) / vd[i], 0), 1) END)) + 0.5) / 255 * vd[i]) AS dv
              |  FROM embeddings, dims)
              |SELECT id, round(dv[1], 4) AS d1,
              |  round(list_aggregate(list_transform(list_zip(embedding::DOUBLE[], dv),
              |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), 4) AS err
              |FROM dec""".stripMargin)),

    // §2.11 SQ4 codec (4-bit, two codes per byte)
    ("sq4_roundtrip", (s: SparkSession, dir: String) => {
      val e = emb(s, dir)
      val mm = e.agg(shim.agg(graft.core.VecMinMaxAgg(shim.expr(col("embedding")))).as("_mm"))
        .select(col("_mm.mins"), col("_mm.maxs")).collect().head
      val mins = mm.getSeq[Double](0).toArray
      val vdiff = mins.indices.map(i => mm.getSeq[Double](1)(i) - mins(i)).toArray
      e.select(col("vec_id"),
        shim.col(graft.core.SQ4Decode(
          graft.core.SQ4Encode(shim.expr(col("embedding")), mins, vdiff),
          mins, vdiff)).as("_dv"),
        col("embedding"))
        .select(col("vec_id"), round(element_at(col("_dv"), 1), 4).as("d1"),
          round(aggregate(
            zip_with(col("embedding").cast("array<double>"), col("_dv"),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x), 4).as("err"))
    },
      Some("""WITH dims AS (
             |  SELECT list(mn ORDER BY i) AS vmn, list(mx - mn ORDER BY i) AS vd FROM (
             |    SELECT i, min(e) AS mn, max(e) AS mx
             |    FROM (SELECT unnest(embedding::DOUBLE[]) AS e, generate_subscripts(embedding, 1) AS i
             |          FROM embeddings) u GROUP BY i) t),
             |dec AS (SELECT vec_id, embedding,
             |  list_transform(embedding::DOUBLE[], (x, i) ->
             |    vmn[i] + (floor(15 * (CASE WHEN vd[i] = 0 THEN 0
             |      ELSE least(greatest((x - vmn[i]) / vd[i], 0), 1) END)) + 0.5) / 15 * vd[i]) AS dv
             |  FROM embeddings, dims)
             |SELECT vec_id, round(dv[1], 4) AS d1,
             |  round(list_aggregate(list_transform(list_zip(embedding::DOUBLE[], dv),
             |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), 4) AS err
             |FROM dec""".stripMargin)),

    // §2.11 SQ6 codec (6-bit, four codes per three bytes)
    ("sq6_roundtrip", (s: SparkSession, dir: String) => {
      val e = emb(s, dir)
      val mm = e.agg(shim.agg(graft.core.VecMinMaxAgg(shim.expr(col("embedding")))).as("_mm"))
        .select(col("_mm.mins"), col("_mm.maxs")).collect().head
      val mins = mm.getSeq[Double](0).toArray
      val vdiff = mins.indices.map(i => mm.getSeq[Double](1)(i) - mins(i)).toArray
      e.select(col("vec_id"),
        shim.col(graft.core.SQ6Decode(
          graft.core.SQ6Encode(shim.expr(col("embedding")), mins, vdiff),
          mins, vdiff)).as("_dv"),
        col("embedding"))
        .select(col("vec_id"), round(element_at(col("_dv"), 1), 4).as("d1"),
          round(aggregate(
            zip_with(col("embedding").cast("array<double>"), col("_dv"),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x), 4).as("err"))
    },
      Some("""WITH dims AS (
             |  SELECT list(mn ORDER BY i) AS vmn, list(mx - mn ORDER BY i) AS vd FROM (
             |    SELECT i, min(e) AS mn, max(e) AS mx
             |    FROM (SELECT unnest(embedding::DOUBLE[]) AS e, generate_subscripts(embedding, 1) AS i
             |          FROM embeddings) u GROUP BY i) t),
             |dec AS (SELECT vec_id, embedding,
             |  list_transform(embedding::DOUBLE[], (x, i) ->
             |    vmn[i] + (floor(63 * (CASE WHEN vd[i] = 0 THEN 0
             |      ELSE least(greatest((x - vmn[i]) / vd[i], 0), 1) END)) + 0.5) / 63 * vd[i]) AS dv
             |  FROM embeddings, dims)
             |SELECT vec_id, round(dv[1], 4) AS d1,
             |  round(list_aggregate(list_transform(list_zip(embedding::DOUBLE[], dv),
             |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), 4) AS err
             |FROM dec""".stripMargin)),

    // §2.11 fp16 codec (IEEE half, round-half-up in magnitude — the
    // codec's bit arithmetic, SqCodec.toHalf). The oracle re-derives
    // the half-precision rounding from first principles in SQL: find
    // the exponent e with 2^e <= |x| < 2^(e+1) (exact power-of-2 join,
    // no log2 misrounding), quantize the 10-bit mantissa grain with
    // floor(y + 0.5), handle subnormals (grain 2^-24 below 2^-14) and
    // the underflow-to-zero cutoff at 2^-25.
    ("fp16_roundtrip", (s: SparkSession, dir: String) =>
      emb(s, dir).select(col("vec_id"),
        shim.col(graft.core.Fp16Decode(
          graft.core.Fp16Encode(shim.expr(col("embedding"))))).as("_dv"),
        col("embedding"))
        .select(col("vec_id"),
          round(element_at(col("_dv"), 1).cast("double"), 6).as("d1"),
          round(aggregate(
            zip_with(col("embedding").cast("array<double>"),
              col("_dv").cast("array<double>"),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x), 8).as("err")),
      Some("""WITH el AS (SELECT vec_id, i, x, abs(x) AS ax FROM (
             |    SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
             |           generate_subscripts(embedding, 1) AS i FROM embeddings) u),
             |ee AS (SELECT e.vec_id, e.i, e.x, e.ax, max(t.e) AS ex
             |       FROM el e LEFT JOIN range(-45,16) t(e) ON power(2.0, t.e) <= e.ax
             |       GROUP BY e.vec_id, e.i, e.x, e.ax),
             |hv AS (SELECT vec_id, i, x,
             |  CASE WHEN ax < power(2.0, -25) THEN 0.0
             |       WHEN ex >= -14 THEN sign(x) * floor(ax / power(2.0, ex-10) + 0.5) * power(2.0, ex-10)
             |       ELSE sign(x) * floor(ax * power(2.0, 24) + 0.5) * power(2.0, -24) END AS dv
             |  FROM ee)
             |SELECT vec_id,
             |  round(max(CASE WHEN i = 1 THEN dv END), 6) AS d1,
             |  round(sum((x-dv)*(x-dv)), 8) AS err
             |FROM hv GROUP BY vec_id""".stripMargin)),

    // IndexRowwiseMinMax (faiss/IndexRowwiseMinMax.h:34; factory
    // prefix `MinMax,`): rowwise scale to [0,1], fp32 (scaler, minv)
    // coefficients, SQfp16 inner codec, decode rescales. A vector
    // CODEC in the reference (search throws) — the oracle replays the
    // whole chain per element: row min/max, fp32 coefficient
    // rounding, the float32 scaled value, IEEE-half re-derivation
    // (the fp16_roundtrip formula) and the rescale.
    ("minmax_roundtrip", (s: SparkSession, dir: String) => {
      val src = emb(s, dir).select(col("vec_id"), col("embedding"))
      val dec = graft.index.MinMaxCodec
        .roundtripDf(src, "vec_id", "embedding", "SQfp16", fp16Coeffs = false)
        .withColumnRenamed("id", "vec_id").withColumnRenamed("vec", "_dv")
      src.join(dec, "vec_id")
        .select(col("vec_id"),
          round(element_at(col("_dv"), 1), 6).as("d1"),
          round(aggregate(
            zip_with(col("embedding").cast("array<double>"), col("_dv"),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x), 6).as("err"))
    },
      Some("""WITH el AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             |    unnest(embedding::DOUBLE[]) AS x FROM embeddings),
             |mm AS (SELECT vec_id, min(x) AS mn,
             |    CAST(max(x) - min(x) AS REAL)::DOUBLE AS sc0 FROM el GROUP BY vec_id),
             |mm2 AS (SELECT vec_id, mn, CASE WHEN sc0 = 0 THEN 1.0 ELSE sc0 END AS sc FROM mm),
             |sv AS (SELECT e.vec_id, e.i, e.x, m.mn, m.sc,
             |    CAST((e.x - m.mn) / m.sc AS REAL)::DOUBLE AS s
             |  FROM el e JOIN mm2 m USING (vec_id)),
             |ee AS (SELECT sv.vec_id, sv.i, sv.x, sv.mn, sv.sc, sv.s, abs(sv.s) AS axs,
             |    max(t.e) AS ex
             |  FROM sv LEFT JOIN range(-45,16) t(e) ON power(2.0, t.e) <= abs(sv.s)
             |  GROUP BY sv.vec_id, sv.i, sv.x, sv.mn, sv.sc, sv.s),
             |hv AS (SELECT vec_id, i, x, mn, sc,
             |  CASE WHEN axs < power(2.0, -25) THEN 0.0
             |       WHEN ex >= -14 THEN sign(s) * floor(axs / power(2.0, ex-10) + 0.5) * power(2.0, ex-10)
             |       ELSE sign(s) * floor(axs * power(2.0, 24) + 0.5) * power(2.0, -24) END AS hval
             |  FROM ee),
             |dec AS (SELECT vec_id, i, x, sc * hval + mn AS dv FROM hv)
             |SELECT vec_id, round(max(CASE WHEN i = 1 THEN dv END), 6) AS d1,
             |  round(sum((x-dv)*(x-dv)), 6) AS err
             |FROM dec GROUP BY vec_id""".stripMargin)),

    // MinMax wrapper with a PQ inner (IndexRowwiseMinMax wraps ANY
    // index, IndexRowwiseMinMax.h:34; factory "MinMax,PQ8"): per-row
    // [0,1] scaling, PQ codebooks trained ON THE SCALED ROWS, encode/
    // decode, rescale. The oracle replays the whole chain: the REAL-
    // rounded scale coefficients, the scaled subvectors, the encode
    // argmin against the trained-codebook sidecar, the ordered decode
    // concat, and the per-element rescale.
    ("minmax_pq_roundtrip", (s: SparkSession, dir: String) => {
      val src = emb(s, dir).select(col("vec_id"), col("embedding"))
      val dec = graft.index.MinMaxCodec
        .roundtripDf(src, "vec_id", "embedding", "PQ8", fp16Coeffs = false,
          pqModel = minmaxPqModel(s, dir))
        .withColumnRenamed("id", "vec_id").withColumnRenamed("vec", "_dv")
      src.join(dec, "vec_id")
        .select(col("vec_id"),
          round(element_at(col("_dv"), 1), 6).as("d1"),
          round(aggregate(
            zip_with(col("embedding").cast("array<double>"), col("_dv"),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x), 6).as("err"))
    },
      Some(s"""WITH cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/minmaxpq_codebooks/*.parquet')),
              |el AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
              |    unnest(embedding::DOUBLE[]) AS x FROM embeddings),
              |mm AS (SELECT vec_id, min(x) AS mn,
              |    CAST(max(x) - min(x) AS REAL)::DOUBLE AS sc0 FROM el GROUP BY vec_id),
              |mm2 AS (SELECT vec_id, mn, CASE WHEN sc0 = 0 THEN 1.0 ELSE sc0 END AS sc FROM mm),
              |sv AS (SELECT e.vec_id, e.i,
              |    CAST((e.x - m.mn) / m.sc AS REAL)::DOUBLE AS s
              |  FROM el e JOIN mm2 m USING (vec_id)),
              |sub AS (SELECT vec_id, (i-1)//8 AS m, list(s ORDER BY i) AS svec
              |  FROM sv GROUP BY vec_id, (i-1)//8),
              |enc AS (SELECT vec_id, m, j FROM (
              |  SELECT b.vec_id, b.m, cb.j, row_number() OVER (PARTITION BY b.vec_id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.svec, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM sub b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |dec AS (SELECT e.vec_id, flatten(list(cb.c ORDER BY e.m)) AS dv
              |  FROM enc e JOIN cb ON cb.m = e.m AND cb.j = e.j GROUP BY e.vec_id)
              |SELECT d.vec_id,
              |  round(d.dv[1] * m.sc + m.mn, 6) AS d1,
              |  round(list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], d.dv),
              |    p -> (p[1] - (p[2]*m.sc + m.mn)) * (p[1] - (p[2]*m.sc + m.mn))), 'sum'), 6) AS err
              |FROM dec d JOIN mm2 m USING (vec_id)
              |JOIN embeddings b ON b.vec_id = d.vec_id""".stripMargin)),

    // §2.11 SQ8 asymmetric (ADC) kNN search
    ("sq8_knn", (s: SparkSession, dir: String) => {
      val sq = graft.index.SqIndex.build(bDf(s, dir, 10), "id", "vec")
      sq.search(qDf(s, dir, 10), 5).withColumn("dist", r4("dist"))
    },
      Some("""WITH dims AS (
             |  SELECT list(mn ORDER BY i) AS vmn, list(mx - mn ORDER BY i) AS vd FROM (
             |    SELECT i, min(e) AS mn, max(e) AS mx
             |    FROM (SELECT unnest(embedding::DOUBLE[]) AS e, generate_subscripts(embedding, 1) AS i
             |          FROM embeddings WHERE vec_id >= 10) u GROUP BY i) t),
             |dec AS (SELECT vec_id AS id,
             |  list_transform(embedding::DOUBLE[], (x, i) ->
             |    vmn[i] + (floor(255 * (CASE WHEN vd[i] = 0 THEN 0
             |      ELSE least(greatest((x - vmn[i]) / vd[i], 0), 1) END)) + 0.5) / 255 * vd[i]) AS dv
             |  FROM embeddings, dims WHERE vec_id >= 10),
             |qd AS (SELECT q.vec_id AS qid, b.id AS id,
             |  list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], b.dv),
             |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS dist
             |  FROM embeddings q CROSS JOIN dec b WHERE q.vec_id < 10)
             |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
             |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank"
             |  FROM qd) w WHERE "rank" <= 5""".stripMargin)),

    // §2.3 IndexRefine: SQ8 coarse stage (k*k_factor) + exact re-rank
    ("refine_sq8_rerank", (s: SparkSession, dir: String) =>
      graft.index.Refine.sqRefineSearch(qDf(s, dir, 10), bDf(s, dir, 10),
        k = 5, kFactor = 4).withColumn("dist", r4("dist")),
      Some("""WITH dims AS (
             |  SELECT list(mn ORDER BY i) AS vmn, list(mx - mn ORDER BY i) AS vd FROM (
             |    SELECT i, min(e) AS mn, max(e) AS mx
             |    FROM (SELECT unnest(embedding::DOUBLE[]) AS e, generate_subscripts(embedding, 1) AS i
             |          FROM embeddings WHERE vec_id >= 10) u GROUP BY i) t),
             |dec AS (SELECT vec_id AS id, embedding,
             |  list_transform(embedding::DOUBLE[], (x, i) ->
             |    vmn[i] + (floor(255 * (CASE WHEN vd[i] = 0 THEN 0
             |      ELSE least(greatest((x - vmn[i]) / vd[i], 0), 1) END)) + 0.5) / 255 * vd[i]) AS dv
             |  FROM embeddings, dims WHERE vec_id >= 10),
             |qd AS (SELECT q.vec_id AS qid, b.id AS id,
             |  list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], b.dv),
             |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS adc,
             |  list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2 AS ed
             |  FROM embeddings q CROSS JOIN dec b WHERE q.vec_id < 10),
             |cand AS (SELECT qid, id, ed FROM (
             |  SELECT qid, id, ed, row_number() OVER (PARTITION BY qid ORDER BY adc, id) AS r1
             |  FROM qd) w WHERE r1 <= 20)
             |SELECT qid, "rank", id, round(ed, 4) AS dist FROM (
             |  SELECT qid, id, ed, row_number() OVER (PARTITION BY qid ORDER BY ed, id) AS "rank"
             |  FROM cand) w2 WHERE "rank" <= 5""".stripMargin)),

    // §2.2/§2.9 RemapDimensionsTransform: kNN in a projected subspace
    ("remap_dims_knn", (s: SparkSession, dir: String) =>
      Knn.knnJoin(
        qDf(s, dir, 10).withColumn("qvec", slice(col("qvec"), 1, 16)),
        bDf(s, dir, 10).withColumn("vec", slice(col("vec"), 1, 16)), 5)
        .withColumn("dist", r4("dist")),
      Some(knnOracle(
        "list_distance(q.embedding[1:16]::DOUBLE[], b.embedding[1:16]::DOUBLE[])^2",
        "q.vec_id < 10", "b.vec_id >= 10", 5))),

    // §2.2 IndexSplitVectors: vertical split, partial distances summed
    ("split_vectors", (s: SparkSession, dir: String) => {
      val q = qDf(s, dir, 5); val b = bDf(s, dir, 5).filter(col("id") < 26)
      b.crossJoin(broadcast(q)).select(col("qid"), col("id"),
        round(l2sq(slice(col("qvec"), 1, 32), slice(col("vec"), 1, 32)) +
          l2sq(slice(col("qvec"), 33, 32), slice(col("vec"), 33, 32)), 4).as("dist"))
    },
      Some(s"""SELECT q.vec_id AS qid, b.vec_id AS id, round($dL2, 4) AS dist
              |FROM embeddings q CROSS JOIN embeddings b
              |WHERE q.vec_id < 5 AND b.vec_id BETWEEN 5 AND 25""".stripMargin)),

    // §2.9 IndexRowwiseMinMax: per-row scaling stored alongside codes
    ("rowwise_minmax", (s: SparkSession, dir: String) => {
      val e = emb(s, dir).select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      e.select(col("vec_id"),
        round(array_min(col("v")), 4).as("rmin"),
        round(array_max(col("v")), 4).as("rmax"),
        round((element_at(col("v"), 1) - array_min(col("v"))) /
          (array_max(col("v")) - array_min(col("v"))), 4).as("s1"))
    },
      Some("""SELECT vec_id,
             |  round(list_aggregate(embedding::DOUBLE[], 'min'), 4) AS rmin,
             |  round(list_aggregate(embedding::DOUBLE[], 'max'), 4) AS rmax,
             |  round((embedding[1]::DOUBLE - list_aggregate(embedding::DOUBLE[], 'min'))
             |    / (list_aggregate(embedding::DOUBLE[], 'max') - list_aggregate(embedding::DOUBLE[], 'min')), 4) AS s1
             |FROM embeddings""".stripMargin)),

    // §2.9 LinearTransform y = Ax (Walsh-pattern ±1 matrix, 4 outputs)
    ("linear_transform", (s: SparkSession, dir: String) => {
      val mat = Array.tabulate(4, 64)((j, i) => if (((i >> j) & 1) == 0) 1f else -1f)
      val y = shim.col(graft.core.MatVec(shim.expr(col("embedding")), mat))
      emb(s, dir).select(col("vec_id"), y.as("_y"))
        .select(col("vec_id"),
          round(element_at(col("_y"), 1), 4).as("y0"),
          round(element_at(col("_y"), 2), 4).as("y1"),
          round(element_at(col("_y"), 3), 4).as("y2"),
          round(element_at(col("_y"), 4), 4).as("y3"))
    },
      Some((0 until 4).map(j =>
        s"round(list_aggregate(list_transform(embedding::DOUBLE[], (x, i) -> CASE WHEN (((i-1)::BIGINT >> $j) & 1) = 0 THEN x ELSE -x END), 'sum'), 4) AS y$j")
        .mkString("SELECT vec_id, ", ", ", " FROM embeddings"))),

    // §2.1 fvecs reader/writer round-trip (fvecs_read / fvecs_write,
    // faiss utils; SURVEY §2.1 row 4): the sf's embeddings are written
    // to a real little-endian .fvecs file (ordered by vec_id), read
    // back with the distributed binaryRecords reader, and fingerprinted
    // per row. The oracle replays the SAME fingerprint from the
    // parquet source with id = row_number over vec_id — any byte-level
    // corruption, dim mix-up, or row reorder breaks the hash.
    ("fvecs_roundtrip", (s: SparkSession, dir: String) => {
      val path = new java.io.File(
        s"target/vecs_io_${math.abs(dir.hashCode)}.fvecs").getAbsolutePath
      val rows = emb(s, dir).orderBy(col("vec_id"))
        .select(col("embedding")).collect()
        .iterator.map(_.getSeq[Float](0).toArray)
      graft.io.VecsIO.writeFvecsLocal(path, rows)
      graft.io.VecsIO.readFvecs(s, path)
        .select(col("id"),
          round(element_at(col("vec"), 1), 4).as("y0"),
          round(aggregate(col("vec").cast("array<double>"), lit(0.0),
            (a, x) => a + x * x), 4).as("nrm"))
    },
      Some("""SELECT row_number() OVER (ORDER BY vec_id) - 1 AS id,
             |  round(embedding[1], 4) AS y0,
             |  round(list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum'), 4) AS nrm
             |FROM embeddings""".stripMargin)),

    // §2.1 VectorTransform persistence round-trip (write_VectorTransform
    // / read_VectorTransform, faiss/impl/index_write.cpp): save a
    // transform chain, load it back, apply the LOADED transform. Same
    // deterministic ±1 matrix and oracle as linear_transform — a
    // persistence bug (row/col swap, bias drop, float corruption)
    // breaks the value compare.
    ("transform_io_roundtrip", (s: SparkSession, dir: String) => {
      val mat = Array.tabulate(4, 64)((j, i) => if (((i >> j) & 1) == 0) 1f else -1f)
      val path = s"target/transform_io_${math.abs(dir.hashCode)}"
      graft.io.IndexIO.saveTransform(s, graft.transform.Chain(
        Seq(graft.transform.Linear(mat))), path)
      // unwrap to the raw matrix and apply via MatVec so the output
      // stays double (Linear.applyCol casts to float for chaining,
      // which would flip the compare schema to float32)
      val lin = graft.io.IndexIO.loadTransform(s, path) match {
        case l: graft.transform.Linear => l
        case graft.transform.Chain(Seq(l: graft.transform.Linear)) => l
        case other => throw new IllegalStateException(s"unexpected $other")
      }
      emb(s, dir).select(col("vec_id"),
        shim.col(graft.core.MatVec(shim.expr(col("embedding")), lin.a)).as("_y"))
        .select(col("vec_id"),
          round(element_at(col("_y"), 1), 4).as("y0"),
          round(element_at(col("_y"), 2), 4).as("y1"),
          round(element_at(col("_y"), 3), 4).as("y2"),
          round(element_at(col("_y"), 4), 4).as("y3"))
    },
      Some((0 until 4).map(j =>
        s"round(list_aggregate(list_transform(embedding::DOUBLE[], (x, i) -> CASE WHEN (((i-1)::BIGINT >> $j) & 1) = 0 THEN x ELSE -x END), 'sum'), 4) AS y$j")
        .mkString("SELECT vec_id, ", ", ", " FROM embeddings"))),

    // §2.11 index_factory end-to-end (index_factory.cpp:885): the
    // factory-built "IVF16,Flat" trains with the same deterministic
    // seed/iters as the memoized ivf16, so its centroids — and
    // therefore the nprobe=4 search — must match the ivf16 sidecar
    // replay exactly. Oracle-gates the parser + build + search path.
    ("factory_ivf_search", (s: SparkSession, dir: String) =>
      factoryIvf16(s, dir).search(qDf(s, dir, 10), 10, nprobe = 4)
        .withColumn("dist", r4("dist")),
      Some(ivfNprobe4Sql)),

    // ,Refine(<code>) factory suffix (IndexRefine, index_factory.cpp:
    // 664): IVF coarse stage at full probe + a Refine(Flat) re-rank —
    // exact end to end (Refine(Flat) ≡ RFlat), so the oracle is the
    // plain exact top-5, proving the whole parse → coarse → k·kFactor
    // candidates → re-rank composition returns exactly the brute-force
    // answer.
    ("factory_refine_search", (s: SparkSession, dir: String) =>
      factoryRefine8(s, dir).search(qDf(s, dir, 10), 5, nprobe = 8)
        .withColumn("dist", r4("dist")),
      Some(s"""SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT q.vec_id AS qid, b.vec_id AS id, $dL2 AS dist,
              |    row_number() OVER (PARTITION BY q.vec_id ORDER BY $dL2, b.vec_id) AS "rank"
              |  FROM embeddings q CROSS JOIN embeddings b
              |  WHERE q.vec_id < 10 AND b.vec_id >= 10) t WHERE "rank" <= 5""".stripMargin)),

    // §2.11 binary flat (BFlat): Hamming kNN over packed sign-bit codes
    ("knn_binary_hamming", (s: SparkSession, dir: String) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), sign_bits(col("embedding")).as("qcode"))
      val b = e.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("id"), sign_bits(col("embedding")).as("code"))
      graft.index.BinaryFlat.knnJoin(q, b, 5)
    },
      Some("""SELECT qid, "rank", id, hd FROM (
             |  SELECT q.vec_id AS qid, b.vec_id AS id,
             |    (SELECT count(*) FROM range(1, 65) r(kk)
             |     WHERE (q.embedding[kk] >= 0) <> (b.embedding[kk] >= 0)) AS hd,
             |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
             |      (SELECT count(*) FROM range(1, 65) r(kk)
             |       WHERE (q.embedding[kk] >= 0) <> (b.embedding[kk] >= 0)), b.vec_id) AS "rank"
             |  FROM embeddings q CROSS JOIN embeddings b
             |  WHERE q.vec_id < 10 AND b.vec_id >= 10) t WHERE "rank" <= 5""".stripMargin)),

    // §2.12 recall / eval_intersection: recall@10 of half-dim search
    ("recall_half_dims", (s: SparkSession, dir: String) => {
      val truth = Knn.knnJoin(qDf(s, dir, 20), bDf(s, dir, 20), 10)
      val approx = Knn.knnJoin(
        qDf(s, dir, 20).withColumn("qvec", slice(col("qvec"), 1, 32)),
        bDf(s, dir, 20).withColumn("vec", slice(col("vec"), 1, 32)), 10)
      graft.eval.Recall.perQuery(truth, approx)
        .withColumn("recall", round(col("recall"), 4))
    },
      Some("""WITH t AS (SELECT qid, id FROM (
             |    SELECT q.vec_id AS qid, b.vec_id AS id,
             |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
             |        list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2, b.vec_id) AS r
             |    FROM embeddings q CROSS JOIN embeddings b
             |    WHERE q.vec_id < 20 AND b.vec_id >= 20) x WHERE r <= 10),
             |a AS (SELECT qid, id FROM (
             |    SELECT q.vec_id AS qid, b.vec_id AS id,
             |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
             |        list_distance(q.embedding[1:32]::DOUBLE[], b.embedding[1:32]::DOUBLE[])^2, b.vec_id) AS r
             |    FROM embeddings q CROSS JOIN embeddings b
             |    WHERE q.vec_id < 20 AND b.vec_id >= 20) x WHERE r <= 10),
             |i AS (SELECT t.qid, count(*) AS c FROM t JOIN a ON t.qid = a.qid AND t.id = a.id GROUP BY t.qid)
             |SELECT q.qid, coalesce(c, 0)::BIGINT AS n_intersect, round(coalesce(c, 0)/10.0, 4) AS recall
             |FROM (SELECT DISTINCT qid FROM t) q LEFT JOIN i ON q.qid = i.qid""".stripMargin)),

    // §2.12 range_PR (contrib/evaluation.py:38-130): precision/recall
    // of a range-search result vs the exact radius scan, distances
    // ignored — here the half-dim scan plays the approximate side, so
    // both spurious results (precision < 1) and misses (recall < 1)
    // occur. Both reference modes: 'overall' pools the counts,
    // 'average' applies the per-query empty-set conventions then
    // averages. Oracle replays the set arithmetic per query in SQL.
    ("range_pr", (s: SparkSession, dir: String) => {
      val qs = qDf(s, dir, 10)
      val truth = Knn.rangeJoin(qs, bDf(s, dir, 10), 1.5)
      val approx = Knn.rangeJoin(
        qs.withColumn("qvec", slice(col("qvec"), 1, 32)),
        bDf(s, dir, 10).withColumn("vec", slice(col("vec"), 1, 32)), 1.5)
      val c = graft.eval.Recall.rangePRCounts(truth, approx, qs)
      graft.eval.Recall.rangePR(c, "overall").withColumn("mode", lit("overall"))
        .unionByName(
          graft.eval.Recall.rangePR(c, "average").withColumn("mode", lit("average")))
        .select(col("mode"), round(col("precision"), 4).as("precision"),
          round(col("recall"), 4).as("recall"))
    },
      Some(s"""WITH qs AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id < 10),
              |gt AS (SELECT q.vec_id AS qid, b.vec_id AS id
              |  FROM embeddings q CROSS JOIN embeddings b
              |  WHERE q.vec_id < 10 AND b.vec_id >= 10 AND $dL2 < 1.5),
              |ap AS (SELECT q.vec_id AS qid, b.vec_id AS id
              |  FROM embeddings q CROSS JOIN embeddings b
              |  WHERE q.vec_id < 10 AND b.vec_id >= 10
              |    AND list_distance(q.embedding[1:32]::DOUBLE[], b.embedding[1:32]::DOUBLE[])^2 < 1.5),
              |c AS (SELECT qs.qid,
              |    coalesce(g.c, 0) AS ngt, coalesce(a.c, 0) AS nres, coalesce(i.c, 0) AS ninter
              |  FROM qs
              |  LEFT JOIN (SELECT qid, count(*) AS c FROM gt GROUP BY qid) g USING (qid)
              |  LEFT JOIN (SELECT qid, count(*) AS c FROM ap GROUP BY qid) a USING (qid)
              |  LEFT JOIN (SELECT gt.qid, count(*) AS c FROM gt JOIN ap ON ap.qid = gt.qid AND ap.id = gt.id GROUP BY gt.qid) i USING (qid))
              |SELECT 'overall' AS "mode",
              |  round(CASE WHEN sum(nres) > 0 THEN sum(ninter)*1.0/sum(nres) ELSE 1.0 END, 4) AS "precision",
              |  round(CASE WHEN sum(ngt) > 0 THEN sum(ninter)*1.0/sum(ngt)
              |             WHEN sum(nres) = 0 THEN 1.0 ELSE 0.0 END, 4) AS recall
              |FROM c
              |UNION ALL
              |SELECT 'average' AS "mode",
              |  round(avg(CASE WHEN nres > 0 THEN ninter*1.0/nres ELSE 1.0 END), 4) AS "precision",
              |  round(avg(CASE WHEN ngt > 0 THEN ninter*1.0/ngt WHEN nres = 0 THEN 1.0 ELSE 0.0 END), 4) AS recall
              |FROM c""".stripMargin)),

    // §2.6 range_search_max_results: radius search with a global cap
    ("range_maxres", (s: SparkSession, dir: String) =>
      Knn.rangeJoin(qDf(s, dir, 20), bDf(s, dir, 20), 2.0)
        .orderBy(col("dist"), col("qid"), col("id")).limit(50)
        .withColumn("dist", r4("dist")),
      Some(s"""SELECT qid, id, round(dist, 4) AS dist FROM (
              |  SELECT q.vec_id AS qid, b.vec_id AS id, $dL2 AS dist
              |  FROM embeddings q CROSS JOIN embeddings b
              |  WHERE q.vec_id < 20 AND b.vec_id >= 20 AND $dL2 < 2.0
              |  ORDER BY dist, qid, id LIMIT 50) t""".stripMargin)),

    // §2.11 IndexPQ ADC search. Oracle reads the trained codebooks
    // sidecar (written by Verify, see OracleAux) and independently
    // re-derives encode (per-subspace argmin), the per-query LUT, and
    // the ADC sum in SQL — full hash check of the PQ pipeline.
    ("pq_adc_search", (s: SparkSession, dir: String) =>
      pq16(s, dir).search(qDf(s, dir, 10), 10).withColumn("dist", r4("dist")),
      Some(s"""WITH cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/pq16_codebooks/*.parquet')),
              |bsub AS (SELECT vec_id AS id, r.m AS m, embedding[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM embeddings, range(0,8) r(m) WHERE vec_id >= 10),
              |enc AS (SELECT id, m, j FROM (
              |  SELECT b.id, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |qsub AS (SELECT vec_id AS qid, r.m AS m, embedding[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM embeddings, range(0,8) r(m) WHERE vec_id < 10),
              |lut AS (SELECT q.qid, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN cb ON cb.m = q.m),
              |adc AS (SELECT l.qid, e.id, list_aggregate(list(l.pd ORDER BY l.m), 'sum') AS dist
              |  FROM enc e JOIN lut l ON l.m = e.m AND l.j = e.j GROUP BY l.qid, e.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM adc) w
              |WHERE "rank" <= 10""".stripMargin)),

    // §2.3 polysemous-style Hamming pre-filter before ADC: the oracle
    // additionally encodes the QUERIES and applies the same byte-wise
    // popcount filter before the ADC ranking.
    ("pq_polysemous_filter", (s: SparkSession, dir: String) =>
      pq16(s, dir).search(qDf(s, dir, 10), 10, polysemousHt = Some(48))
        .withColumn("dist", r4("dist")),
      Some(s"""WITH cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/pq16_codebooks/*.parquet')),
              |bsub AS (SELECT vec_id AS id, r.m AS m, embedding[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM embeddings, range(0,8) r(m) WHERE vec_id >= 10),
              |enc AS (SELECT id, m, j FROM (
              |  SELECT b.id, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |qsub AS (SELECT vec_id AS qid, r.m AS m, embedding[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM embeddings, range(0,8) r(m) WHERE vec_id < 10),
              |qenc AS (SELECT qid, m, j FROM (
              |  SELECT q.qid, q.m, cb.j, row_number() OVER (PARTITION BY q.qid, q.m ORDER BY
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM qsub q JOIN cb ON cb.m = q.m) t WHERE rn = 1),
              |ham AS (SELECT qe.qid, e.id,
              |    list_aggregate(list(bit_count(xor(e.j::BIGINT, qe.j::BIGINT)) ORDER BY e.m), 'sum') AS hd
              |  FROM enc e JOIN qenc qe ON qe.m = e.m GROUP BY qe.qid, e.id),
              |lut AS (SELECT q.qid, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN cb ON cb.m = q.m),
              |adc AS (SELECT l.qid, e.id, list_aggregate(list(l.pd ORDER BY l.m), 'sum') AS dist
              |  FROM enc e JOIN lut l ON l.m = e.m AND l.j = e.j
              |  JOIN ham h ON h.qid = l.qid AND h.id = e.id
              |  WHERE h.hd <= 48 GROUP BY l.qid, e.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM adc) w
              |WHERE "rank" <= 10""".stripMargin)),

    // §2.11 fast-scan PQ (IndexPQFastScan, faiss/IndexPQFastScan.h:20;
    // quantize_lut.cpp round_uint8_per_column): 4-bit codes, per-query
    // LUT affine-quantized to uint8, INTEGER accumulation. The oracle
    // replays the whole pipeline — encode from the codebook sidecar,
    // LUT in double arithmetic, quantization (shared a = 255/max_span,
    // per-subquantizer bias), integer sum — exactly; qdist is integer
    // on both sides so the ranking compare is arithmetic-exact, and
    // dist = qdist/a + b is the same two double ops on both sides.
    ("pq4fs_search", (s: SparkSession, dir: String) =>
      pqfs8(s, dir).search(qDf(s, dir, 10), 10),
      Some(s"""WITH cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/pqfs_codebooks/*.parquet')),
              |bsub AS (SELECT vec_id AS id, r.m AS m, embedding[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM embeddings, range(0,8) r(m) WHERE vec_id >= 10),
              |enc AS (SELECT id, m, j FROM (
              |  SELECT b.id, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |qsub AS (SELECT vec_id AS qid, r.m AS m, embedding[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM embeddings, range(0,8) r(m) WHERE vec_id < 10),
              |lut AS (SELECT q.qid, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN cb ON cb.m = q.m),
              |colstat AS (SELECT qid, m, min(pd) AS mn, max(pd) - min(pd) AS span FROM lut GROUP BY qid, m),
              |scal AS (SELECT qid, 255.0 / max(span) AS a,
              |    list_aggregate(list(mn ORDER BY m), 'sum') AS b FROM colstat GROUP BY qid),
              |lq AS (SELECT l.qid, l.m, l.j, floor((l.pd - cs.mn) * sc.a + 0.5)::BIGINT AS lq
              |  FROM lut l JOIN colstat cs ON cs.qid = l.qid AND cs.m = l.m
              |  JOIN scal sc ON sc.qid = l.qid),
              |acc AS (SELECT l.qid, e.id, sum(l.lq)::BIGINT AS qdist
              |  FROM enc e JOIN lq l ON l.m = e.m AND l.j = e.j GROUP BY l.qid, e.id)
              |SELECT w.qid, "rank", id, qdist, round(qdist / sc.a + sc.b, 4) AS dist FROM (
              |  SELECT qid, id, qdist, row_number() OVER (PARTITION BY qid ORDER BY qdist, id) AS "rank" FROM acc) w
              |JOIN scal sc ON sc.qid = w.qid WHERE "rank" <= 10""".stripMargin)),

    // §2.11 additive-quantizer fast-scan (ST_norm_rq2x4,
    // faiss/IndexAdditiveQuantizerFastScan.h:30): RQ codes + 2-nibble
    // scalar-RQ norm code scanned as one quantized-LUT integer
    // accumulate over L+2 columns. Oracle replays EVERYTHING from the
    // codes/codebook sidecars: reconstruction norms, greedy norm
    // encode, the −2·<q,cb> + norm-codebook LUT, uint8 quantization,
    // integer sum — qdist is integer-exact on both sides.
    ("rq4fs_search", (s: SparkSession, dir: String) =>
      rqfs2(s, dir).search(qDf(s, dir, 10), 10),
      Some(s"""WITH cb AS (SELECT m, j, c FROM read_parquet('$AUX/rq_codebooks/*.parquet')),
              |codes AS (SELECT id, codes FROM read_parquet('$AUX/rq_codes/*.parquet')),
              |ncb AS (SELECT l, j, c FROM read_parquet('$AUX/rq4fs_normcb/*.parquet')),
              |ns AS (SELECT ns FROM read_parquet('$AUX/rq4fs_normscale/*.parquet')),
              |dec AS (SELECT codes.id, codes.codes,
              |    list_transform(list_zip(c0.c, c1.c), p -> p[1] + p[2]) AS dv
              |  FROM codes JOIN cb c0 ON c0.m = 0 AND c0.j = codes.codes[1]
              |  JOIN cb c1 ON c1.m = 1 AND c1.j = codes.codes[2]),
              |nb AS (SELECT id, codes,
              |    list_aggregate(list_transform(dv::DOUBLE[], x -> x*x), 'sum') AS nv FROM dec),
              |n1 AS (SELECT id, codes, nv, j AS j1, c AS c1 FROM (
              |  SELECT nb.id, nb.codes, nb.nv, ncb.j, ncb.c,
              |    row_number() OVER (PARTITION BY nb.id ORDER BY abs(nb.nv - ncb.c), ncb.j) AS rn
              |  FROM nb JOIN ncb ON ncb.l = 0) t WHERE rn = 1),
              |n2 AS (SELECT id, codes, j1, j AS j2 FROM (
              |  SELECT n1.id, n1.codes, n1.j1, ncb.j,
              |    row_number() OVER (PARTITION BY n1.id ORDER BY abs((n1.nv - n1.c1) - ncb.c), ncb.j) AS rn
              |  FROM n1 JOIN ncb ON ncb.l = 1) t WHERE rn = 1),
              |enc AS (SELECT id, 0 AS m, codes[1] AS j FROM n2
              |  UNION ALL SELECT id, 1, codes[2] FROM n2
              |  UNION ALL SELECT id, 2, j1 FROM n2
              |  UNION ALL SELECT id, 3, j2 FROM n2),
              |lut AS (SELECT q.vec_id AS qid, cb.m, cb.j,
              |    -2 * list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], cb.c::DOUBLE[]), p -> p[1]*p[2]), 'sum') AS pd
              |  FROM embeddings q CROSS JOIN cb WHERE q.vec_id < 10
              |  UNION ALL
              |  SELECT q.vec_id AS qid, 2 + ncb.l AS m, ncb.j, ncb.c / (SELECT ns FROM ns) AS pd
              |  FROM embeddings q CROSS JOIN ncb WHERE q.vec_id < 10),
              |colstat AS (SELECT qid, m, min(pd) AS mn, max(pd) - min(pd) AS span FROM lut GROUP BY qid, m),
              |scal AS (SELECT qid, 255.0 / max(span) AS a,
              |    list_aggregate(list(mn ORDER BY m), 'sum') AS b FROM colstat GROUP BY qid),
              |lq AS (SELECT l.qid, l.m, l.j, floor((l.pd - cs.mn) * sc.a + 0.5)::BIGINT AS lq
              |  FROM lut l JOIN colstat cs ON cs.qid = l.qid AND cs.m = l.m
              |  JOIN scal sc ON sc.qid = l.qid),
              |qn AS (SELECT vec_id AS qid,
              |    list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum') AS qn
              |  FROM embeddings WHERE vec_id < 10),
              |acc AS (SELECT l.qid, e.id,
              |    sum(CASE WHEN l.m >= 2 THEN l.lq * (SELECT ns FROM ns) ELSE l.lq END)::BIGINT AS qdist
              |  FROM enc e JOIN lq l ON l.m = e.m AND l.j = e.j GROUP BY l.qid, e.id)
              |SELECT w.qid, "rank", id, qdist, round(qn.qn + qdist / sc.a + sc.b, 4) AS dist FROM (
              |  SELECT qid, id, qdist, row_number() OVER (PARTITION BY qid ORDER BY qdist, id) AS "rank" FROM acc) w
              |JOIN scal sc ON sc.qid = w.qid JOIN qn ON qn.qid = w.qid
              |WHERE "rank" <= 10""".stripMargin)),

    // LSQ-family AQ fast-scan (`LSQ2x4fs`,
    // IndexLocalSearchQuantizerFastScan, index_factory.cpp:610): the
    // SAME (L+2)-column quantized-LUT integer scan as rq4fs, with the
    // codes refined by iterated conditional modes. The ICM descent is
    // not SQL-replayable, so the oracle takes the engine's integer
    // codes (twin-call sidecar) and replays EVERYTHING downstream:
    // decode, reconstruction norms, greedy norm encode, the
    // -2<q,cb> + norm-codebook LUT, uint8 quantization, integer sum —
    // qdist integer-exact on both sides.
    ("lsq4fs_search", (s: SparkSession, dir: String) =>
      lsqfs2(s, dir).search(qDf(s, dir, 10), 10),
      Some(s"""WITH cb AS (SELECT m, j, c FROM read_parquet('$AUX/lsq4fs_codebooks/*.parquet')),
              |codes AS (SELECT id, codes FROM read_parquet('$AUX/lsq4fs_codes/*.parquet')),
              |ncb AS (SELECT l, j, c FROM read_parquet('$AUX/lsq4fs_normcb/*.parquet')),
              |ns AS (SELECT ns FROM read_parquet('$AUX/lsq4fs_normscale/*.parquet')),
              |dec AS (SELECT codes.id, codes.codes,
              |    list_transform(list_zip(c0.c, c1.c), p -> p[1] + p[2]) AS dv
              |  FROM codes JOIN cb c0 ON c0.m = 0 AND c0.j = codes.codes[1]
              |  JOIN cb c1 ON c1.m = 1 AND c1.j = codes.codes[2]),
              |nb AS (SELECT id, codes,
              |    list_aggregate(list_transform(dv::DOUBLE[], x -> x*x), 'sum') AS nv FROM dec),
              |n1 AS (SELECT id, codes, nv, j AS j1, c AS c1 FROM (
              |  SELECT nb.id, nb.codes, nb.nv, ncb.j, ncb.c,
              |    row_number() OVER (PARTITION BY nb.id ORDER BY abs(nb.nv - ncb.c), ncb.j) AS rn
              |  FROM nb JOIN ncb ON ncb.l = 0) t WHERE rn = 1),
              |n2 AS (SELECT id, codes, j1, j AS j2 FROM (
              |  SELECT n1.id, n1.codes, n1.j1, ncb.j,
              |    row_number() OVER (PARTITION BY n1.id ORDER BY abs((n1.nv - n1.c1) - ncb.c), ncb.j) AS rn
              |  FROM n1 JOIN ncb ON ncb.l = 1) t WHERE rn = 1),
              |enc AS (SELECT id, 0 AS m, codes[1] AS j FROM n2
              |  UNION ALL SELECT id, 1, codes[2] FROM n2
              |  UNION ALL SELECT id, 2, j1 FROM n2
              |  UNION ALL SELECT id, 3, j2 FROM n2),
              |lut AS (SELECT q.vec_id AS qid, cb.m, cb.j,
              |    -2 * list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], cb.c::DOUBLE[]), p -> p[1]*p[2]), 'sum') AS pd
              |  FROM embeddings q CROSS JOIN cb WHERE q.vec_id < 10
              |  UNION ALL
              |  SELECT q.vec_id AS qid, 2 + ncb.l AS m, ncb.j, ncb.c / (SELECT ns FROM ns) AS pd
              |  FROM embeddings q CROSS JOIN ncb WHERE q.vec_id < 10),
              |colstat AS (SELECT qid, m, min(pd) AS mn, max(pd) - min(pd) AS span FROM lut GROUP BY qid, m),
              |scal AS (SELECT qid, 255.0 / max(span) AS a,
              |    list_aggregate(list(mn ORDER BY m), 'sum') AS b FROM colstat GROUP BY qid),
              |lq AS (SELECT l.qid, l.m, l.j, floor((l.pd - cs.mn) * sc.a + 0.5)::BIGINT AS lq
              |  FROM lut l JOIN colstat cs ON cs.qid = l.qid AND cs.m = l.m
              |  JOIN scal sc ON sc.qid = l.qid),
              |qn AS (SELECT vec_id AS qid,
              |    list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum') AS qn
              |  FROM embeddings WHERE vec_id < 10),
              |acc AS (SELECT l.qid, e.id, sum(CASE WHEN l.m >= 2 THEN l.lq * (SELECT ns FROM ns) ELSE l.lq END)::BIGINT AS qdist
              |  FROM enc e JOIN lq l ON l.m = e.m AND l.j = e.j GROUP BY l.qid, e.id)
              |SELECT w.qid, "rank", id, qdist, round(qn.qn + qdist / sc.a + sc.b, 4) AS dist FROM (
              |  SELECT qid, id, qdist, row_number() OVER (PARTITION BY qid ORDER BY qdist, id) AS "rank" FROM acc) w
              |JOIN scal sc ON sc.qid = w.qid JOIN qn ON qn.qid = w.qid
              |WHERE "rank" <= 10""".stripMargin)),

    // Product AQ fast-scan (`PRQ2x2x4fs`,
    // IndexProductResidualQuantizerFastScan, index_factory.cpp:626):
    // two independent per-split RQs whose (ns*L+2)-column integer scan
    // reuses the flat machinery through ZERO-PADDED effective
    // codebooks (<q, cb_eff[s*L+l][j]> = <q_slice, cb_s[l][j]>). The
    // oracle reads the effective codebooks + the per-split-encoded
    // integer codes and replays decode (per-component the zero terms
    // are exact, so the 2-float round-once argument still holds),
    // norms, norm encode, the 6-column LUT, quantization and the
    // integer sum.
    ("prq4fs_search", (s: SparkSession, dir: String) =>
      prqfs22(s, dir).search(qDf(s, dir, 10), 10),
      Some(s"""WITH cb AS (SELECT m, j, c FROM read_parquet('$AUX/prq4fs_codebooks/*.parquet')),
              |codes AS (SELECT id, codes FROM read_parquet('$AUX/prq4fs_codes/*.parquet')),
              |ncb AS (SELECT l, j, c FROM read_parquet('$AUX/prq4fs_normcb/*.parquet')),
              |ns AS (SELECT ns FROM read_parquet('$AUX/prq4fs_normscale/*.parquet')),
              |enc0 AS (SELECT id, r.m AS m, codes[r.m+1] AS j FROM codes, range(0,4) r(m)),
              |comp AS (SELECT e.id, generate_subscripts(cb.c, 1) AS i, unnest(cb.c) AS v
              |  FROM enc0 e JOIN cb ON cb.m = e.m AND cb.j = e.j),
              |sumd AS (SELECT id, i, sum(v)::REAL AS v FROM comp GROUP BY id, i),
              |dv AS (SELECT id, list(v ORDER BY i) AS dv FROM sumd GROUP BY id),
              |nb AS (SELECT id, list_aggregate(list_transform(dv::DOUBLE[], x -> x*x), 'sum') AS nv FROM dv),
              |n1 AS (SELECT id, nv, j AS j1, c AS c1 FROM (
              |  SELECT nb.id, nb.nv, ncb.j, ncb.c,
              |    row_number() OVER (PARTITION BY nb.id ORDER BY abs(nb.nv - ncb.c), ncb.j) AS rn
              |  FROM nb JOIN ncb ON ncb.l = 0) t WHERE rn = 1),
              |n2 AS (SELECT id, j1, j AS j2 FROM (
              |  SELECT n1.id, n1.j1, ncb.j,
              |    row_number() OVER (PARTITION BY n1.id ORDER BY abs((n1.nv - n1.c1) - ncb.c), ncb.j) AS rn
              |  FROM n1 JOIN ncb ON ncb.l = 1) t WHERE rn = 1),
              |enc AS (SELECT id, m, j FROM enc0
              |  UNION ALL SELECT id, 4, j1 FROM n2
              |  UNION ALL SELECT id, 5, j2 FROM n2),
              |lut AS (SELECT q.vec_id AS qid, cb.m, cb.j,
              |    -2 * list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], cb.c::DOUBLE[]), p -> p[1]*p[2]), 'sum') AS pd
              |  FROM embeddings q CROSS JOIN cb WHERE q.vec_id < 10
              |  UNION ALL
              |  SELECT q.vec_id AS qid, 4 + ncb.l AS m, ncb.j, ncb.c / (SELECT ns FROM ns) AS pd
              |  FROM embeddings q CROSS JOIN ncb WHERE q.vec_id < 10),
              |colstat AS (SELECT qid, m, min(pd) AS mn, max(pd) - min(pd) AS span FROM lut GROUP BY qid, m),
              |scal AS (SELECT qid, 255.0 / max(span) AS a,
              |    list_aggregate(list(mn ORDER BY m), 'sum') AS b FROM colstat GROUP BY qid),
              |lq AS (SELECT l.qid, l.m, l.j, floor((l.pd - cs.mn) * sc.a + 0.5)::BIGINT AS lq
              |  FROM lut l JOIN colstat cs ON cs.qid = l.qid AND cs.m = l.m
              |  JOIN scal sc ON sc.qid = l.qid),
              |qn AS (SELECT vec_id AS qid,
              |    list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum') AS qn
              |  FROM embeddings WHERE vec_id < 10),
              |acc AS (SELECT l.qid, e.id, sum(CASE WHEN l.m >= 4 THEN l.lq * (SELECT ns FROM ns) ELSE l.lq END)::BIGINT AS qdist
              |  FROM enc e JOIN lq l ON l.m = e.m AND l.j = e.j GROUP BY l.qid, e.id)
              |SELECT w.qid, "rank", id, qdist, round(qn.qn + qdist / sc.a + sc.b, 4) AS dist FROM (
              |  SELECT qid, id, qdist, row_number() OVER (PARTITION BY qid ORDER BY qdist, id) AS "rank" FROM acc) w
              |JOIN scal sc ON sc.qid = w.qid JOIN qn ON qn.qid = w.qid
              |WHERE "rank" <= 10""".stripMargin)),

    // rescale_norm EXERCISED (VERDICT r13 #3): the flat AQ fast-scan
    // over the adversarial-span table trains norm_scale well above 1
    // (measured 8 at sf0.001), so the quantized LUT's two norm columns
    // are DIVIDED by it before the shared uint8 grid and the integer
    // scan multiplies their lookups back (NormTableScaler,
    // faiss/impl/LookupTableScaler.h:50; estimate_norm_scale,
    // IndexAdditiveQuantizerFastScan.cpp:111-145). The oracle replays
    // the whole chain from sidecars — decode, reconstruction norms,
    // greedy norm encode, divided-column LUT, quantization, the SCALED
    // integer accumulate — qdist integer-exact on both sides.
    ("rq4fs_rescale_search", (s: SparkSession, dir: String) =>
      rqfsRs(s, dir).search(qDf(s, dir, 10), 10),
      Some(rq4fsRescaleSql)),

    // write_index/read_index for the fast-scan family (index_write.cpp
    // — the SURVEY IO row extended to the r14 rescale state): the
    // rescaling AQ fast-scan index persists nibble-packed codes, RQ
    // codebooks, norm codebooks AND the trained norm_scale to
    // parquet+JSON; the RELOADED index must replay the scaled integer
    // chain bit for bit, so the oracle is rq4fs_rescale_search's
    // verbatim (the on-disk trained state equals the twin-call
    // sidecar state).
    ("fastscan_io_roundtrip", (s: SparkSession, dir: String) => {
      val path = s"target/fastscan_io_${math.abs(dir.hashCode)}"
      graft.io.IndexIO.saveRq4Fs(rqfsRs(s, dir), path)
      graft.io.IndexIO.loadRq4Fs(s, path).search(qDf(s, dir, 10), 10)
    },
      Some(rq4fsRescaleSql)),

    // §2.11 IVF AQ fast-scan (IndexIVFAdditiveQuantizerFastScan,
    // non-residual): the flat rq4fs scan behind a coarse-quantizer
    // probe at nprobe=4 of nlist=8. Oracle = probe replay (centroid
    // sidecar) + the full rq4fs integer replay with candidates
    // restricted to the probed lists' base assignment.
    ("ivfrq4fs_search", (s: SparkSession, dir: String) =>
      ivfrqfs8(s, dir).search(qDf(s, dir, 10), 10, nprobe = 4),
      Some(s"""WITH cb AS (SELECT m, j, c FROM read_parquet('$AUX/rq_codebooks/*.parquet')),
              |codes AS (SELECT id, codes FROM read_parquet('$AUX/rq_codes/*.parquet')),
              |ncb AS (SELECT l, j, c FROM read_parquet('$AUX/rq4fs_normcb/*.parquet')),
              |cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfrqfs_centroids/*.parquet')),
              |probes AS (SELECT qid, list_no FROM (
              |  SELECT q.vec_id AS qid, c.list_no, row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS pr
              |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10) t WHERE pr <= 4),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |dec AS (SELECT codes.id, codes.codes,
              |    list_transform(list_zip(c0.c, c1.c), p -> p[1] + p[2]) AS dv
              |  FROM codes JOIN cb c0 ON c0.m = 0 AND c0.j = codes.codes[1]
              |  JOIN cb c1 ON c1.m = 1 AND c1.j = codes.codes[2]),
              |nb AS (SELECT id, codes,
              |    list_aggregate(list_transform(dv::DOUBLE[], x -> x*x), 'sum') AS nv FROM dec),
              |n1 AS (SELECT id, codes, nv, j AS j1, c AS c1 FROM (
              |  SELECT nb.id, nb.codes, nb.nv, ncb.j, ncb.c,
              |    row_number() OVER (PARTITION BY nb.id ORDER BY abs(nb.nv - ncb.c), ncb.j) AS rn
              |  FROM nb JOIN ncb ON ncb.l = 0) t WHERE rn = 1),
              |n2 AS (SELECT id, codes, j1, j AS j2 FROM (
              |  SELECT n1.id, n1.codes, n1.j1, ncb.j,
              |    row_number() OVER (PARTITION BY n1.id ORDER BY abs((n1.nv - n1.c1) - ncb.c), ncb.j) AS rn
              |  FROM n1 JOIN ncb ON ncb.l = 1) t WHERE rn = 1),
              |enc AS (SELECT id, 0 AS m, codes[1] AS j FROM n2
              |  UNION ALL SELECT id, 1, codes[2] FROM n2
              |  UNION ALL SELECT id, 2, j1 FROM n2
              |  UNION ALL SELECT id, 3, j2 FROM n2),
              |lut AS (SELECT q.vec_id AS qid, cb.m, cb.j,
              |    -2 * list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], cb.c::DOUBLE[]), p -> p[1]*p[2]), 'sum') AS pd
              |  FROM embeddings q CROSS JOIN cb WHERE q.vec_id < 10
              |  UNION ALL
              |  SELECT q.vec_id AS qid, 2 + ncb.l AS m, ncb.j, ncb.c AS pd
              |  FROM embeddings q CROSS JOIN ncb WHERE q.vec_id < 10),
              |colstat AS (SELECT qid, m, min(pd) AS mn, max(pd) - min(pd) AS span FROM lut GROUP BY qid, m),
              |scal AS (SELECT qid, 255.0 / max(span) AS a,
              |    list_aggregate(list(mn ORDER BY m), 'sum') AS b FROM colstat GROUP BY qid),
              |lq AS (SELECT l.qid, l.m, l.j, floor((l.pd - cs.mn) * sc.a + 0.5)::BIGINT AS lq
              |  FROM lut l JOIN colstat cs ON cs.qid = l.qid AND cs.m = l.m
              |  JOIN scal sc ON sc.qid = l.qid),
              |qn AS (SELECT vec_id AS qid,
              |    list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum') AS qn
              |  FROM embeddings WHERE vec_id < 10),
              |acc AS (SELECT l.qid, e.id, sum(l.lq)::BIGINT AS qdist
              |  FROM enc e JOIN lq l ON l.m = e.m AND l.j = e.j
              |  JOIN basg ba ON ba.id = e.id JOIN probes p ON p.qid = l.qid AND p.list_no = ba.list_no
              |  GROUP BY l.qid, e.id)
              |SELECT w.qid, "rank", id, qdist, round(qn.qn + qdist / sc.a + sc.b, 4) AS dist FROM (
              |  SELECT qid, id, qdist, row_number() OVER (PARTITION BY qid ORDER BY qdist, id) AS "rank" FROM acc) w
              |JOIN scal sc ON sc.qid = w.qid JOIN qn ON qn.qid = w.qid
              |WHERE "rank" <= 10""".stripMargin)),

    // §2.11 IVF fast-scan (IndexIVFPQFastScan, non-residual — the
    // reference default, IndexIVFPQFastScan.cpp:47): probe replay at
    // nprobe=4 + the same exact quantized-LUT integer replay over the
    // probed lists' candidates.
    ("ivfpq4fs_search", (s: SparkSession, dir: String) =>
      ivfpqfs8(s, dir).search(qDf(s, dir, 10), 10, nprobe = 4),
      Some(ivfpq4fsNprobe4Sql)),

    // `IVF<n>_HNSW<m>,PQ<M>x4fs` — HNSW coarse composed with the
    // nibble-packed fast-scan code (the factory parses the coarse
    // independently of the code, index_factory.cpp:253-256). Same
    // memoized index as ivfpq4fs_search; efSearch = 4096 >= nlist
    // degenerates the walk to the exact probe set, so the quantized
    // integer-LUT replay applies verbatim.
    ("ivf_hnsw_pq4fs_search", (s: SparkSession, dir: String) =>
      ivfpqfs8(s, dir).search(qDf(s, dir, 10), 10, nprobe = 4,
        coarse = Some(graft.index.Probes.HnswCoarse(4096))),
      Some(ivfpq4fsNprobe4Sql)),

    // Residual IVFPQ fast-scan (IVF8,PQ8x4fsr — by_residual = true,
    // bulk-loaded from the trained ivfpq8 via the
    // IndexIVFPQFastScan(const IndexIVFPQ&) path, so the oracle reads
    // the SAME centroid/codebook sidecars): per-(query, probed-list)
    // quantized LUT over the float32 residual, integer ADC, candidates
    // ranked on the dequantized qdist/a + b (the reference's per-list
    // normalizers applied before the cross-list merge).
    ("ivfpq4fsr_search", (s: SparkSession, dir: String) =>
      ivfpqfsr8(s, dir).search(qDf(s, dir, 10), 10, nprobe = 4),
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfpq_centroids/*.parquet')),
              |cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/ivfpq_codebooks/*.parquet')),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |bres AS (SELECT a.id, a.list_no,
              |    list_transform(list_zip(b.embedding, c.c), p -> p[1] - p[2]) AS res
              |  FROM basg a JOIN embeddings b ON b.vec_id = a.id JOIN cent c ON c.list_no = a.list_no),
              |bsub AS (SELECT id, list_no, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM bres, range(0,8) r(m)),
              |enc AS (SELECT id, list_no, m, j FROM (
              |  SELECT b.id, b.list_no, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |qc AS (SELECT q.vec_id AS qid, c.list_no, row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS pr
              |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10),
              |probes AS (SELECT qid, list_no FROM qc WHERE pr <= 4),
              |qres AS (SELECT q.vec_id AS qid, p.list_no,
              |    list_transform(list_zip(q.embedding, c.c), x -> x[1] - x[2]) AS res
              |  FROM embeddings q JOIN probes p ON p.qid = q.vec_id
              |  JOIN cent c ON c.list_no = p.list_no),
              |qsub AS (SELECT qid, list_no, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM qres, range(0,8) r(m)),
              |lut AS (SELECT q.qid, q.list_no, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN cb ON cb.m = q.m),
              |colstat AS (SELECT qid, list_no, m, min(pd) AS mn, max(pd) - min(pd) AS span
              |  FROM lut GROUP BY qid, list_no, m),
              |scal AS (SELECT qid, list_no, 255.0 / max(span) AS a,
              |    list_aggregate(list(mn ORDER BY m), 'sum') AS b FROM colstat GROUP BY qid, list_no),
              |lq AS (SELECT l.qid, l.list_no, l.m, l.j, floor((l.pd - cs.mn) * sc.a + 0.5)::BIGINT AS lq
              |  FROM lut l JOIN colstat cs ON cs.qid = l.qid AND cs.list_no = l.list_no AND cs.m = l.m
              |  JOIN scal sc ON sc.qid = l.qid AND sc.list_no = l.list_no),
              |acc AS (SELECT l.qid, e.id, sum(l.lq)::DOUBLE / any_value(sc.a) + any_value(sc.b) AS dist
              |  FROM enc e JOIN lq l ON l.list_no = e.list_no AND l.m = e.m AND l.j = e.j
              |  JOIN scal sc ON sc.qid = l.qid AND sc.list_no = e.list_no
              |  GROUP BY l.qid, e.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM acc) w
              |WHERE "rank" <= 10""".stripMargin)),

    // By-residual IVF AQ fast-scan (IVF8,RQ2x4fsr,
    // IndexIVFAdditiveQuantizerFastScan.cpp:590 + the LUT-math block
    // :353-403): the RQ encodes RESIDUALS but the stored 2-nibble norm
    // carries the FULL reconstruction norm ||c + decode(r)||^2, so the
    // LUT stays one-per-query over q itself and the by-residual part
    // is a scalar -2<q,c> bias per probed list; candidates rank on the
    // dequantized q^2 + bias + qdist/a + b. The oracle replays the
    // ENTIRE chain from three sidecars (centroids, residual codebooks,
    // norm codebooks): coarse assignment, float32 residuals, the
    // greedy (beam=1) two-level RQ encode, decode + reconstruction
    // norm, the greedy 2x4 norm encode, the (L+2)-column LUT, uint8
    // quantization, probe selection, integer accumulate, bias and
    // dequantized ranking.
    ("ivfrq4fsr_search", (s: SparkSession, dir: String) =>
      ivfrqfsr8(s, dir).search(qDf(s, dir, 10), 10, nprobe = 4),
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfrqfsr_centroids/*.parquet')),
              |cb AS (SELECT m, j, c FROM read_parquet('$AUX/ivfrqfsr_codebooks/*.parquet')),
              |ncb AS (SELECT l, j, c FROM read_parquet('$AUX/ivfrqfsr_normcb/*.parquet')),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |bres AS (SELECT a.id, a.list_no,
              |    list_transform(list_zip(b.embedding, c.c), p -> p[1] - p[2]) AS res
              |  FROM basg a JOIN embeddings b ON b.vec_id = a.id JOIN cent c ON c.list_no = a.list_no),
              |e0 AS (SELECT id, list_no, res, j AS j0 FROM (
              |  SELECT b.id, b.list_no, b.res, cb.j, row_number() OVER (PARTITION BY b.id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.res::DOUBLE[], cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bres b JOIN cb ON cb.m = 0) t WHERE rn = 1),
              |r1 AS (SELECT e0.id, e0.list_no, e0.j0,
              |    list_transform(list_zip(e0.res, c0.c), p -> p[1] - p[2]) AS res1
              |  FROM e0 JOIN cb c0 ON c0.m = 0 AND c0.j = e0.j0),
              |e1 AS (SELECT id, list_no, j0, j AS j1 FROM (
              |  SELECT r.id, r.list_no, r.j0, cb.j, row_number() OVER (PARTITION BY r.id ORDER BY
              |    list_aggregate(list_transform(list_zip(r.res1::DOUBLE[], cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM r1 r JOIN cb ON cb.m = 1) t WHERE rn = 1),
              |dec AS (SELECT e1.id, e1.list_no, e1.j0, e1.j1,
              |    list_transform(list_zip(c0.c, c1.c), p -> p[1] + p[2]) AS dv
              |  FROM e1 JOIN cb c0 ON c0.m = 0 AND c0.j = e1.j0
              |  JOIN cb c1 ON c1.m = 1 AND c1.j = e1.j1),
              |nb AS (SELECT d.id, d.list_no, d.j0, d.j1,
              |    list_aggregate(list_transform(list_transform(list_zip(c.c, d.dv), p -> (p[1] + p[2])::REAL)::DOUBLE[], x -> x*x), 'sum') AS nv
              |  FROM dec d JOIN cent c ON c.list_no = d.list_no),
              |n1 AS (SELECT id, list_no, j0, j1, nv, j AS m1, c AS c1 FROM (
              |  SELECT nb.id, nb.list_no, nb.j0, nb.j1, nb.nv, ncb.j, ncb.c,
              |    row_number() OVER (PARTITION BY nb.id ORDER BY abs(nb.nv - ncb.c), ncb.j) AS rn
              |  FROM nb JOIN ncb ON ncb.l = 0) t WHERE rn = 1),
              |n2 AS (SELECT id, list_no, j0, j1, m1, j AS m2 FROM (
              |  SELECT n1.id, n1.list_no, n1.j0, n1.j1, n1.m1, ncb.j,
              |    row_number() OVER (PARTITION BY n1.id ORDER BY abs((n1.nv - n1.c1) - ncb.c), ncb.j) AS rn
              |  FROM n1 JOIN ncb ON ncb.l = 1) t WHERE rn = 1),
              |enc AS (SELECT id, list_no, 0 AS m, j0 AS j FROM n2
              |  UNION ALL SELECT id, list_no, 1, j1 FROM n2
              |  UNION ALL SELECT id, list_no, 2, m1 FROM n2
              |  UNION ALL SELECT id, list_no, 3, m2 FROM n2),
              |lut AS (SELECT q.vec_id AS qid, cb.m, cb.j,
              |    -2 * list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], cb.c::DOUBLE[]), p -> p[1]*p[2]), 'sum') AS pd
              |  FROM embeddings q CROSS JOIN cb WHERE q.vec_id < 10
              |  UNION ALL
              |  SELECT q.vec_id AS qid, 2 + ncb.l AS m, ncb.j, ncb.c AS pd
              |  FROM embeddings q CROSS JOIN ncb WHERE q.vec_id < 10),
              |colstat AS (SELECT qid, m, min(pd) AS mn, max(pd) - min(pd) AS span FROM lut GROUP BY qid, m),
              |scal AS (SELECT qid, 255.0 / max(span) AS a,
              |    list_aggregate(list(mn ORDER BY m), 'sum') AS b FROM colstat GROUP BY qid),
              |lq AS (SELECT l.qid, l.m, l.j, floor((l.pd - cs.mn) * sc.a + 0.5)::BIGINT AS lq
              |  FROM lut l JOIN colstat cs ON cs.qid = l.qid AND cs.m = l.m
              |  JOIN scal sc ON sc.qid = l.qid),
              |probes AS (SELECT qid, list_no, bias FROM (
              |  SELECT q.vec_id AS qid, c.list_no,
              |    -2 * list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], c.c::DOUBLE[]), p -> p[1]*p[2]), 'sum') AS bias,
              |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |      list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS pr
              |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10) t WHERE pr <= 4),
              |qn AS (SELECT vec_id AS qid,
              |    list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum') AS qn
              |  FROM embeddings WHERE vec_id < 10),
              |acc AS (SELECT l.qid, e.id, any_value(p.bias) AS bias, sum(l.lq)::BIGINT AS qdist
              |  FROM enc e JOIN lq l ON l.m = e.m AND l.j = e.j
              |  JOIN probes p ON p.qid = l.qid AND p.list_no = e.list_no
              |  GROUP BY l.qid, e.id),
              |d AS (SELECT a.qid, a.id, qn.qn + a.bias + a.qdist / sc.a + sc.b AS dist
              |  FROM acc a JOIN scal sc ON sc.qid = a.qid JOIN qn ON qn.qid = a.qid)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 10""".stripMargin)),

    // write_index/read_index MATRIX (VERDICT r15 #7): every
    // persistable family's save → kind-dispatch load (read_index,
    // faiss/index_io.h:38) → reverse_index_factory → equality check,
    // as ONE oracle-visible row set (the IndexIOSpec round-trips made
    // gate-visible). Per family: build a tiny index over a fixed
    // 490-vector slice, save it, reload it WITHOUT being told its
    // family (the kind tag), derive the canonical factory string from
    // the persisted meta, and compare the reloaded index against its
    // in-session twin — searchable families by an identical kNN
    // (qid, rank, id), codec carriers (two-layer, lattice, MinMax) by
    // full reconstruction, binary flat by its codes table.
    // ok = non-empty AND set-equal. The oracle pins the 26 canonical
    // factory strings and the gate booleans (the knn_graph_nndescent
    // pattern: DuckDB cannot replay a save/load lifecycle, so the
    // engine-computed equality IS the check and a regression flips
    // the hash red).
    ("index_io_matrix", (s: SparkSession, dir: String) => {
      import graft.io.IndexIO
      import graft.index._
      val e0 = emb(s, dir)
      // fixed slice: 490 vectors at EVERY sf (embeddings has >= 500
      // rows from sf0.001 up), so build cost does not grow with sf.
      // coalesce(1): every downstream lifecycle job over this slice
      // is a single task — the wall here is tiny-job scheduling, and
      // a 490-row slice spread over the source's file splits pays it
      // per split per job (VERDICT r16 #5)
      val base = e0.filter(col("vec_id") >= 10 && col("vec_id") < 500)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
        .coalesce(1).cache()
      val q = e0.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val qc = q.select(col("qid"), sign_bits(col("qvec")).as("qcode"))
      val bcodes = base.select(col("id"), sign_bits(col("vec")).as("code"))
      // per-invocation unique scratch root (ADVICE r17): the tree is
      // recursively deleted in the finally below, so a stable
      // basename-keyed path would let a concurrent Bench/Verify pair
      // on the same sf delete each other's in-flight saved indexes
      val rootPath = {
        val t = java.nio.file.Paths.get("target")
        java.nio.file.Files.createDirectories(t)
        java.nio.file.Files.createTempDirectory(t, "io_matrix_")
      }
      val root = rootPath.toString
      // bounded-collect compare (<= 490 rows x 26 families, the
      // distributed_ondisk_recipe idiom): ONE action per GATE (r20,
      // VERDICT r19 #3) — both sides union into a single side-tagged
      // collect instead of one collect per side, halving the 52
      // compare jobs to 26. The boolean per family is unchanged:
      // non-empty AND set-equal on the same canonicalized rows.
      def setEq(a: DataFrame, b: DataFrame): Boolean = {
        def tag(df: DataFrame, side: Int) =
          df.select(lit(side).as("_side"),
            struct(df.columns.map(col): _*).as("_r"))
        val rows = tag(a, 0).unionByName(tag(b, 1)).collect()
        def canon(side: Int): Seq[Seq[Any]] =
          rows.toSeq.filter(_.getInt(0) == side)
            .map(_.getStruct(1).toSeq.map {
              case b: Array[Byte] => b.toSeq
              case q: scala.collection.Seq[_] => q.toSeq
              case v => v
            }).sortBy(_.toString())
        val x = canon(0)
        x.nonEmpty && x == canon(1)
      }
      def sr(df: DataFrame): DataFrame = df.select("qid", "rank", "id")
      // the 26 family lifecycles are independent tiny-job chains;
      // overlap them on a bounded pool (concurrent Spark actions are
      // the intended scheduler use — this is wall-clock packing, not
      // extra work)
      val thunks = Seq.newBuilder[() => (String, Boolean)]
      def add(tag: String, save: String => Unit, twin: => DataFrame,
          run: Any => DataFrame): Unit = {
        thunks += (() => {
          val p = s"$root/$tag"
          save(p)
          (IndexIO.reverseFactory(s, p),
            setEq(run(IndexIO.load(s, p)), twin))
        })
      }
      lazy val ivf = IvfIndex.build(base, "id", "vec", nlist = 8, niter = 2)
      add("ivfflat", IvfIndex.save(ivf, _), sr(ivf.search(q, 5, nprobe = 8)),
        a => sr(a.asInstanceOf[IvfIndex].search(q, 5, nprobe = 8)))
      lazy val sq = SqIndex.build(base, "id", "vec")
      add("sq", IndexIO.saveSq(sq, _), sr(sq.search(q, 5)),
        a => sr(a.asInstanceOf[SqIndex].search(q, 5)))
      lazy val pq = PqIndex.build(base, "id", "vec", m = 8, ksub = 16, niter = 2)
      add("pq", IndexIO.savePq(pq, _), sr(pq.search(q, 5)),
        a => sr(a.asInstanceOf[PqIndex].search(q, 5)))
      lazy val ivfpq = IvfPqIndex.build(base, "id", "vec", nlist = 4, m = 8,
        ksub = 16, niterCoarse = 2, niterPq = 2)
      add("ivfpq", IndexIO.saveIvfPq(ivfpq, _),
        sr(ivfpq.search(q, 5, nprobe = 4)),
        a => sr(a.asInstanceOf[IvfPqIndex].search(q, 5, nprobe = 4)))
      lazy val tl = TwoLayerIndex.build(base, "id", "vec", nlist = 4, m = 8,
        ksub = 16, niterCoarse = 2, niterPq = 2)
      add("twolayer", IndexIO.saveTwoLayer(tl, _), tl.reconstruct,
        a => a.asInstanceOf[TwoLayerIndex].reconstruct)
      lazy val miq = MiqTwoLayerIndex.build(base, "id", "vec", mCoarse = 2,
        nbit = 4, m = 8, ksub = 16, niterCoarse = 2, niterPq = 2)
      add("miq2layer", IndexIO.saveMiqTwoLayer(miq, _), miq.reconstruct,
        a => a.asInstanceOf[MiqTwoLayerIndex].reconstruct)
      lazy val bivf = BinaryIvfIndex.buildFromVectors(base, "id", "vec",
        nlist = 4, niter = 2)
      add("bivf", IndexIO.saveBinaryIvf(bivf, _),
        sr(bivf.search(qc, 5, nprobe = 4)),
        a => sr(a.asInstanceOf[BinaryIvfIndex].search(qc, 5, nprobe = 4)))
      lazy val imi = ImiIndex.build(base, "id", "vec", ksub = 4, niter = 2)
      add("imi", IndexIO.saveImi(imi, _), sr(imi.search(q, 5, nprobe = 16)),
        a => sr(a.asInstanceOf[ImiIndex].search(q, 5, nprobe = 16)))
      lazy val imipq = ImiPqIndex.build(base, "id", "vec", ksub = 4, m = 8,
        pqKsub = 16, niterCoarse = 2, niterPq = 2)
      add("imipq", IndexIO.saveImiPq(imipq, _),
        sr(imipq.search(q, 5, nprobe = 16)),
        a => sr(a.asInstanceOf[ImiPqIndex].search(q, 5, nprobe = 16)))
      lazy val sh = IvfSpectralHash.build(base, "id", "vec", nlist = 4,
        nbit = 16, period = 1.0, thresholdType = "global", niter = 2)
      add("ivfsh", IndexIO.saveSpectralHash(sh, _),
        sr(sh.search(q, 5, nprobe = 4)),
        a => sr(a.asInstanceOf[IvfSpectralHashIndex].search(q, 5, nprobe = 4)))
      lazy val pqfs = Pq4FastScanIndex.build(base, "id", "vec", m = 8, niter = 2)
      add("pq4fs", IndexIO.savePq4Fs(pqfs, _), sr(pqfs.search(q, 5)),
        a => sr(a.asInstanceOf[Pq4FastScanIndex].search(q, 5)))
      lazy val ipqfs = IvfPq4FastScanIndex.build(base, "id", "vec", nlist = 4,
        m = 8, niterCoarse = 2, niterPq = 2)
      add("ivfpq4fs", IndexIO.saveIvfPq4Fs(ipqfs, _),
        sr(ipqfs.search(q, 5, nprobe = 4)),
        a => sr(a.asInstanceOf[IvfPq4FastScanIndex].search(q, 5, nprobe = 4)))
      lazy val ipqfsr = IvfPq4FastScanRIndex.build(base, "id", "vec", nlist = 4,
        m = 8, niterCoarse = 2, niterPq = 2)
      add("ivfpq4fsr", IndexIO.saveIvfPq4FsR(ipqfsr, _),
        sr(ipqfsr.search(q, 5, nprobe = 4)),
        a => sr(a.asInstanceOf[IvfPq4FastScanRIndex].search(q, 5, nprobe = 4)))
      lazy val rqfs = Rq4FastScanIndex.build(base, "id", "vec", levels = 2,
        niter = 2)
      add("rq4fs", IndexIO.saveRq4Fs(rqfs, _), sr(rqfs.search(q, 5)),
        a => sr(a.asInstanceOf[Rq4FastScanIndex].search(q, 5)))
      lazy val irqfs = IvfRq4FastScanIndex.build(base, "id", "vec", nlist = 4,
        levels = 2, niterCoarse = 2, niter = 2)
      add("ivfrq4fs", IndexIO.saveIvfRq4Fs(irqfs, _),
        sr(irqfs.search(q, 5, nprobe = 4)),
        a => sr(a.asInstanceOf[IvfRq4FastScanIndex].search(q, 5, nprobe = 4)))
      lazy val irqfsr = IvfRq4FastScanRIndex.build(base, "id", "vec", nlist = 4,
        levels = 2, niterCoarse = 2, niter = 2)
      add("ivfrq4fsr", IndexIO.saveIvfRq4FsR(irqfsr, _),
        sr(irqfsr.search(q, 5, nprobe = 4)),
        a => sr(a.asInstanceOf[IvfRq4FastScanRIndex].search(q, 5, nprobe = 4)))
      lazy val ivfsq = IvfSqIndex.build(base, "id", "vec", nlist = 4, niter = 2,
        byResidual = true, qtype = "SQ8")
      add("ivfsq", IndexIO.saveIvfSq(ivfsq, _),
        sr(ivfsq.search(q, 5, nprobe = 4)),
        a => sr(a.asInstanceOf[IvfSqIndex].search(q, 5, nprobe = 4)))
      lazy val ivfrq = IvfRq.build(base, "id", "vec", nlist = 4, levels = 2,
        k = 16, niterCoarse = 2, niterRq = 2)
      add("ivfrq", IndexIO.saveIvfRq(ivfrq, _),
        sr(ivfrq.search(q, 5, nprobe = 4)),
        a => sr(a.asInstanceOf[IvfRqIndex].search(q, 5, nprobe = 4)))
      lazy val ivfrqn = new IvfRqNormIndex(ivfrq, ivfrq.codes, nonorm = true)
      add("ivfrqnorm", IndexIO.saveIvfRqNorm(ivfrqn, _),
        sr(ivfrqn.search(q, 5, nprobe = 4)),
        a => sr(a.asInstanceOf[IvfRqNormIndex].search(q, 5, nprobe = 4)))
      add("bflat", IndexIO.saveBinaryFlat(bcodes, _), bcodes,
        a => a.asInstanceOf[DataFrame])
      lazy val bh = BinaryHashIndex.build(bcodes, b = 6)
      add("bhash", IndexIO.saveBinaryHash(bh, _), sr(bh.search(qc, 5)),
        a => sr(a.asInstanceOf[BinaryHashIndex].search(qc, 5)))
      lazy val bmh = new BinaryMultiHashIndex(4, 8, bcodes)
      add("bmultihash", IndexIO.saveBinaryMultiHash(bmh, _),
        sr(bmh.search(qc, 5)),
        a => sr(a.asInstanceOf[BinaryMultiHashIndex].search(qc, 5)))
      // embeddings are d=64 (the znLat16 fixture's contract)
      lazy val rot = graft.transform.Linear(
        graft.transform.Transforms.randomRotation(64, 1234L).a)
      lazy val th = Some(Array.tabulate(64)(i => 0.01 * (i % 5 - 2)))
      lazy val lsh = new LshIndex(rot, th, base.select(col("id"),
        LshIndex.signBits(rot, th, col("vec")).as("code")))
      add("lsh", IndexIO.saveLsh(lsh, _), sr(lsh.search(q, 5)),
        a => sr(a.asInstanceOf[LshIndex].search(q, 5)))
      lazy val lat = Lattice.build(base, "id", "vec", nsq = 16, scaleNbit = 8,
        r2 = 10)
      add("lattice", IndexIO.saveLattice(lat, _), lat.reconstruct,
        a => a.asInstanceOf[LatticeIndex].reconstruct)
      lazy val mm = MinMaxCodec.buildIndex(base, "id", "vec", "SQ8",
        fp16Coeffs = false, niter = 2)
      add("minmax", IndexIO.saveMinMax(mm, _), mm.reconstruct,
        a => a.asInstanceOf[MinMaxIndex].reconstruct)
      lazy val rf = RefineFlatIndex.build(base, "id", "vec", kFactor = 3)
      add("refineflat", IndexIO.saveRefineFlat(rf, _), sr(rf.search(q, 5)),
        a => sr(a.asInstanceOf[RefineFlatIndex].search(q, 5)))
      base.count() // materialize the shared cache once, outside the pool
      // Scoped single-partition execution (r20, VERDICT r19 #3): this
      // row's input is a FIXED 490-vector slice at every sf (its own
      // scale contract, above), so 32-way shuffles and AQE's
      // job-per-stage materialization only multiply tiny jobs — every
      // exchange here moves <100 KB. shuffle.partitions=1 + AQE off,
      // scoped to the lifecycle pool and restored after, turns each
      // search/build stage chain into single-task jobs (ProfileOne:
      // 509 → ~230 jobs, task count 1674 → ~500). Scale-safe BECAUSE
      // the slice never grows with sf; sf-scaled rows keep the session
      // confs. Results identical: partitioning only reorders the
      // double-sum tails inside the tiny builds, and every equality
      // gate compares the reloaded index against its OWN in-session
      // twin built from the same centroids.
      val scopedConfs = Seq(
        "spark.sql.shuffle.partitions" -> "1",
        "spark.sql.adaptive.enabled" -> "false")
      val prevConfs = scopedConfs.map { case (key, _) =>
        key -> s.conf.getOption(key) }
      scopedConfs.foreach { case (key, v) => s.conf.set(key, v) }
      // (KMeans.fit's own tiny-shuffle scope writes the same values
      // concurrently from the pool threads — identical-value scopes
      // compose safely, see graft.core.ScopedConf.)
      // one thread per lifecycle (r19): the 26 chains are independent
      // sequences of mostly single-task jobs, so the wall is per-job
      // latency × chain length ÷ overlap — task slots (32 cores), not
      // threads, are the binding resource, and at 12 threads the
      // longest chains queue behind short ones. Measured (ProfileOne,
      // 3 repeats each on a drifting box): job-seconds absorbed per
      // wall-second rose ~5.5× → ~10× at pool 26 with the same ~1000
      // job total; wall itself was inside the box's noise band.
      // Guide §2.6: overlap independent jobs so the tail of one chain
      // back-fills the others' idle slots.
      val ts = thunks.result()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(ts.size)
      val rows = try {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: ExecutionContext =
          ExecutionContext.fromExecutor(pool)
        // every thunk SETTLES before control reaches the finally
        // (ADVICE r17): a bare Future.sequence returns on the first
        // failure while sibling lifecycles are still mid save/load,
        // and the rm() below would delete trees they are reading.
        // Try-wrapping makes the sequence total; .map(_.get) then
        // rethrows the first failure with the pool already quiet.
        Await.result(
          Future.sequence(ts.map(t => Future(scala.util.Try(t())))),
          Duration.Inf).map(_.get)
      } finally {
        pool.shutdown()
        prevConfs.foreach {
          case (key, Some(v)) => s.conf.set(key, v)
          case (key, None) => s.conf.unset(key)
        }
        // hand back the shared storage slice and the 26 saved index
        // trees — a long catalog session must not accumulate either
        // (ADVICE r16: the cached slice otherwise contends with every
        // downstream query's fixtures for the storage pool)
        base.unpersist(false)
        def rm(f: java.io.File): Unit = {
          // listFiles is null on IO error/concurrent delete; an NPE
          // here would mask the original exception (ADVICE r17)
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(); ()
        }
        rm(rootPath.toFile)
      }
      import s.implicits._
      rows.sortBy(_._1).toDF("family", "ok")
    },
      Some("""SELECT family, ok FROM (VALUES
             |  ('BFlat', true), ('BHash4x8', true), ('BHash6', true),
             |  ('BIVF4', true), ('IMI2x2,Flat', true),
             |  ('IMI2x2,PQ8x16', true), ('IVF4,PQ8x16', true),
             |  ('IVF4,PQ8x4fs', true), ('IVF4,PQ8x4fsr', true),
             |  ('IVF4,RQ2x4', true), ('IVF4,RQ2x4_Nnone', true),
             |  ('IVF4,RQ2x4fs', true), ('IVF4,RQ2x4fsr', true),
             |  ('IVF4,SH16x1g', true), ('IVF4,SQ8', true),
             |  ('IVF8,Flat', true), ('LSHrt', true), ('MinMax,SQ8', true),
             |  ('PQ8x16', true), ('PQ8x4fs', true), ('RQ2x4fs', true),
             |  ('Residual2x4,PQ8x16', true), ('Residual4,PQ8x16', true),
             |  ('SQ8', true), ('SQ8,RFlat', true),
             |  ('ZnLattice16x10_8', true)) t(family, ok)
             |ORDER BY family""".stripMargin)),
  )
}
