package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim
import graft.core._
import graft.functions.topk

/** Fast-scan PQ family (faiss/IndexFastScan.h:29 — IndexPQFastScan,
  * faiss/IndexPQFastScan.h:20; IndexIVFPQFastScan,
  * faiss/IndexIVFPQFastScan.h:26; factory token `PQ<M>x4fs`,
  * index_factory.cpp): 4-bit product quantizer whose codes are
  * nibble-packed (code_size = ceil(M/2)) and whose per-query LUT is
  * affine-quantized to uint8 (quantize_lut.cpp round_uint8_per_column)
  * so candidate scoring is pure small-integer accumulation —
  * approximate distance = qdist/a + b.
  *
  * The reference's bbs register-tile layout and AVX kernels are
  * physical-layer SIMD with no dataflow analog (SURVEY §7); what is
  * carried is everything that changes the scan at scale: half-width
  * codes on disk/wire, a 4 KiB LUT that stays cache/broadcast-resident,
  * and integer (not float) accumulate in the tight loop. Ranking
  * follows the quantized score exactly as the reference's
  * non-rescoring path does, so recall matches the reference's
  * semantics, not just its API.
  *
  * The IVF variant is non-residual (by_residual = false), matching the
  * reference default for IndexIVFPQFastScan
  * (IndexIVFPQFastScan.cpp:47: "set to false by default because it's
  * much faster") — ONE quantized LUT per query shared across probes,
  * broadcast with the probe table.
  */
class Pq4FastScanIndex(val model: PqModel, val codes: DataFrame) {
  require(model.ksub <= 16, s"fast-scan needs 4-bit codes, got ksub=${model.ksub}")

  /** Exact integer replay of the quantized scan: qid, rank, id,
    * qdist (integer score), dist (≈ float ADC distance). */
  def search(queries: DataFrame, k: Int,
      queryId: String = "qid", queryVec: String = "qvec"): DataFrame = {
    val q = queries.select(col(queryId),
      shim.col(Pq4QuantLut(shim.expr(col(queryVec)), model.codebooks)).as("_ql"))
    codes.crossJoin(broadcast(q))
      .select(col(queryId),
        shim.col(Pq4AdcQ(shim.expr(col("code")), shim.expr(col("_ql.lutq"))))
          .cast("double").as("_d"),
        col("id"), col("_ql.a").as("_a"), col("_ql.b").as("_b"))
      .groupBy(col(queryId))
      .agg(topk(col("_d"), col("id"), k, asc = true).as("_tk"),
        first(col("_a")).as("_a"), first(col("_b")).as("_b"))
      .select(col(queryId), col("_a"), col("_b"),
        posexplode(col("_tk")).as(Seq("_pos", "_r")))
      .select(col(queryId), (col("_pos") + 1).cast("long").as("rank"),
        col("_r.id").as("id"), col("_r.dist").cast("long").as("qdist"),
        round(col("_r.dist") / col("_a") + col("_b"), 4).as("dist"))
  }
}

object Pq4FastScanIndex {
  /** Train a 4-bit PQ and nibble-pack the codes (compute_codes +
    * pq4_pack_codes logical content). */
  def build(df: DataFrame, idCol: String, vecCol: String, m: Int = 8,
      niter: Int = 8, seed: Long = 1234L): Pq4FastScanIndex = {
    val model = Pq.train(df, vecCol, m, ksub = 16, niter = niter, seed = seed)
    // materialize: encoding is add-time work (compute_codes), not
    // something every search should redo
    val codes = df.select(col(idCol).as("id"),
      shim.col(Pq4PackCodes(
        PQEncode(shim.expr(col(vecCol)), model.codebooks))).as("code"))
      .cache()
    codes.count()
    new Pq4FastScanIndex(model, codes)
  }
}

/** IVFPQFastScan analog: coarse quantizer for list pruning + the
  * quantized-LUT integer scan over nibble-packed NON-residual codes
  * (reference default). codes: (id, list_no, code). */
class IvfPq4FastScanIndex(
    val nlist: Int,
    val centroids: Array[Array[Float]],
    val model: PqModel,
    val codes: DataFrame) {

  def search(queries: DataFrame, k: Int, nprobe: Int,
      queryId: String = "qid", queryVec: String = "qvec"): DataFrame = {
    // LUT computed ONCE per query (pre-explode), replicated over the
    // probe rows by the generator; collect once and build both the
    // static pruning set and the broadcast table from the same rows
    // (the IvfRq single-execution idiom)
    val probesPlan = queries.select(col(queryId),
      shim.col(Pq4QuantLut(shim.expr(col(queryVec)), model.codebooks)).as("_ql"),
      explode(shim.col(NearestCentroids(shim.expr(col(queryVec)), centroids,
        math.min(nprobe, nlist), "l2sq"))).as("_p"))
      .select(col(queryId), col("_ql"), col("_p.list_no").as("list_no"))
    val probeRows = probesPlan.collect()
    val probed = probeRows.map(r => r.getInt(r.fieldIndex("list_no"))).distinct
    val spark = queries.sparkSession
    val probeDf = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probesPlan.schema)
    codes.filter(col("list_no").isin(probed.map(Integer.valueOf).toSeq: _*))
      .join(broadcast(probeDf), "list_no")
      .select(col(queryId),
        shim.col(Pq4AdcQ(shim.expr(col("code")), shim.expr(col("_ql.lutq"))))
          .cast("double").as("_d"),
        col("id"), col("_ql.a").as("_a"), col("_ql.b").as("_b"))
      .groupBy(col(queryId))
      .agg(topk(col("_d"), col("id"), k, asc = true).as("_tk"),
        first(col("_a")).as("_a"), first(col("_b")).as("_b"))
      .select(col(queryId), col("_a"), col("_b"),
        posexplode(col("_tk")).as(Seq("_pos", "_r")))
      .select(col(queryId), (col("_pos") + 1).cast("long").as("rank"),
        col("_r.id").as("id"), col("_r.dist").cast("long").as("qdist"),
        round(col("_r.dist") / col("_a") + col("_b"), 4).as("dist"))
  }
}

object IvfPq4FastScanIndex {
  def build(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16, m: Int = 8,
      niterCoarse: Int = 8, niterPq: Int = 6, seed: Long = 1234L): IvfPq4FastScanIndex = {
    val data = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val coarse = graft.cluster.KMeans.fit(data, "vec",
      graft.cluster.KMeans.Params(k = nlist, niter = niterCoarse, seed = seed))
    // non-residual: PQ trained on (and encoding) the raw vectors
    val model = Pq.train(data, "vec", m, ksub = 16, niter = niterPq, seed = seed)
    val codes = coarse.assign(data, "vec")
      .select(col("id"), col("list_no"),
        shim.col(Pq4PackCodes(
          PQEncode(shim.expr(col("vec")), model.codebooks))).as("code"))
      .cache()
    codes.count()
    new IvfPq4FastScanIndex(coarse.centroids.length, coarse.centroids, model, codes)
  }
}
