package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim
import graft.core.PQSubAssign
import graft.functions.{topk, vec_dist}

/** IMI — inverted multi-index (MultiIndexQuantizer, faiss/IndexPQ.h:139-171,
  * used as the `IMI2x…` coarse quantizer of every SIFT1B/Deep1B
  * baseline): the coarse quantizer is a 2-subspace product quantizer,
  * so the cell table is the CARTESIAN product of two K-entry codebooks
  * — K² cells from 2K trained centroids. Cell distance decomposes as
  * d(q, cell(j1,j2)) = d(q_half1, cb1[j1]) + d(q_half2, cb2[j2]), so
  * probe selection ranks K² sums computed from two K-entry LUTs
  * (faiss's multi-sequence scan, IndexPQ.cpp MultiIndexQuantizer::search).
  *
  * Spark shape: training reuses the joint subspace Lloyd of
  * [[Pq.train]] (m=2); cell assignment is one [[PQEncode]] expression;
  * probe selection is LUT explode + the bounded-heap top-nprobe
  * aggregate; the scan is the same statically pruned cell join as
  * [[IvfIndex]] — at scale the K² cells partition the corpus finer
  * than plain IVF for the same training cost (256 cells from 32
  * centroids here).
  */
class ImiIndex(
    val ksub: Int,
    val model: PqModel,
    /** (id, vec, cell) */
    val invlists: DataFrame) {

  def nlist: Int = ksub * ksub

  /** Exact-distance search over the nprobe best cells.
    * Output (qid, rank, id, dist). */
  def search(queries: DataFrame, k: Int, nprobe: Int,
      queryId: String = "qid", queryVec: String = "qvec",
      metric: String = "l2sq"): DataFrame = {
    val kl = lit(ksub)
    // per-query cell ranking from the two half-space LUTs
    val probes = queries
      .select(col(queryId), col(queryVec), model.lutCol(col(queryVec)).as("_lut"))
      .select(col(queryId), col(queryVec), col("_lut"),
        explode(sequence(lit(0), lit(nlist - 1))).as("_cell"))
      .select(col(queryId), col(queryVec), col("_cell"),
        (element_at(col("_lut"), (col("_cell") / kl).cast("int") + 1) +
          element_at(col("_lut"), kl + pmod(col("_cell"), kl).cast("int") + 1)).as("_cd"))
      .groupBy(col(queryId), col(queryVec))
      .agg(topk(col("_cd"), col("_cell").cast("long"), nprobe, asc = true).as("_tk"))
      .select(col(queryId), col(queryVec), explode(col("_tk")).as("_r"))
      .select(col(queryId), col(queryVec), col("_r.id").cast("int").as("cell"))
    scanCells(probes, k, queryId, queryVec, metric)
  }

  /** MultiIndexQuantizer2 search (faiss/IndexPQ.h:171 — "the PQ
    * assignment is performed by sub-indexes";
    * MultiIndexQuantizer2::search, IndexPQ.cpp:1042): instead of
    * ranking all K² cells from the two LUTs, each HALF-SPACE runs its
    * own top-k2 search through its assign sub-index (k2 =
    * min(nprobe, ksub), the reference's k2; the default sub-index is
    * an exact flat scan of the K half-centroids, which the LUT is),
    * and the cell ranking is the min-sum combine of the two k2-lists
    * (the reference's MinSumK) — k2·k2 candidate sums instead of K².
    * Same top-nprobe cells as [[search]] (min-sum over per-half top-k2
    * is exhaustive for any final rank <= k2), then the identical
    * pruned cell scan. */
  def search2(queries: DataFrame, k: Int, nprobe: Int,
      queryId: String = "qid", queryVec: String = "qvec",
      metric: String = "l2sq"): DataFrame = {
    val kl = lit(ksub)
    val k2 = math.min(math.max(nprobe, 1), ksub)
    // level 1: per-half top-k2 through the assign sub-index (LUT =
    // the flat scan of that half's centroids); ties on lower j
    val halfTop = queries
      .select(col(queryId), col(queryVec), model.lutCol(col(queryVec)).as("_lut"))
      .select(col(queryId), col(queryVec), explode(sequence(lit(0), lit(1))).as("_m"),
        col("_lut"))
      .select(col(queryId), col(queryVec), col("_m"),
        posexplode(slice(col("_lut"), col("_m") * kl + 1, kl)).as(Seq("_j", "_hd")))
      .groupBy(col(queryId), col("_m"))
      .agg(first(col(queryVec)).as(queryVec),
        topk(col("_hd"), col("_j").cast("long"), k2, asc = true).as("_tk"))
      .select(col(queryId), col(queryVec), col("_m"), explode(col("_tk")).as("_r"))
      .select(col(queryId), col(queryVec), col("_m"),
        col("_r.id").cast("int").as("_j"), col("_r.dist").as("_hd"))
    // level 2: MinSumK — combine the two k2-lists, keep the nprobe
    // best cells
    val h0 = halfTop.filter(col("_m") === 0)
      .select(col(queryId), col(queryVec), col("_j").as("_j0"), col("_hd").as("_d0"))
    val h1 = halfTop.filter(col("_m") === 1)
      .select(col(queryId), col("_j").as("_j1"), col("_hd").as("_d1"))
    val probes = h0.join(h1, Seq(queryId))
      .select(col(queryId), col(queryVec),
        (col("_j0") * kl + col("_j1")).as("_cell"),
        (col("_d0") + col("_d1")).as("_cd"))
      .groupBy(col(queryId))
      .agg(first(col(queryVec)).as(queryVec),
        topk(col("_cd"), col("_cell").cast("long"), nprobe, asc = true).as("_tk"))
      .select(col(queryId), col(queryVec), explode(col("_tk")).as("_r"))
      .select(col(queryId), col(queryVec), col("_r.id").cast("int").as("cell"))
    scanCells(probes, k, queryId, queryVec, metric)
  }

  /** Shared pruned cell scan: static cell pruning + broadcast probes +
    * exact distance + partial/merge top-k. */
  private def scanCells(probes: DataFrame, k: Int,
      queryId: String, queryVec: String, metric: String): DataFrame = {
    val probed = probes.select("cell").distinct().collect().map(_.getInt(0))
    invlists.filter(col("cell").isin(probed.map(Integer.valueOf): _*))
      .join(broadcast(probes), "cell")
      .select(col(queryId), col("id"),
        vec_dist(col(queryVec), col("vec"), metric).as("_d"))
      .groupBy(col(queryId))
      .agg(topk(col("_d"), col("id"), k, asc = true).as("_tk"))
      .select(col(queryId), posexplode(col("_tk")).as(Seq("_pos", "_r")))
      .select(col(queryId), (col("_pos") + 1).cast("long").as("rank"),
        col("_r.id").as("id"), col("_r.dist").as("dist"))
  }
}

object ImiIndex {
  /** Train the 2-subspace coarse quantizer + assign every row to its
    * cartesian cell. */
  def build(df: DataFrame, idCol: String, vecCol: String, ksub: Int = 16,
      niter: Int = 6, seed: Long = 1234L): ImiIndex = {
    val data = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val model = Pq.train(data, "vec", m = 2, ksub = ksub, niter = niter, seed = seed)
    val dsub = model.dsub
    // cell = argmin(half1)*K + argmin(half2) — first-wins ties, the
    // same per-subspace assignment the training loop uses
    val j0 = shim.col(PQSubAssign(shim.expr(lit(0)),
      shim.expr(slice(col("vec"), 1, dsub)), model.codebooks))
    val j1 = shim.col(PQSubAssign(shim.expr(lit(1)),
      shim.expr(slice(col("vec"), dsub + 1, dsub)), model.codebooks))
    val invlists = data.select(col("id"), col("vec"),
      (j0 * ksub + j1).as("cell"))
    new ImiIndex(ksub, model, invlists)
  }
}
