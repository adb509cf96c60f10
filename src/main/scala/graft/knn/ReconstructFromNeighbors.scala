package graft.knn

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ReconstructFromNeighbors (faiss/IndexHNSW.h:24-81, IndexHNSW.cpp:
  * 620-860; the fork's ReconstructFromNeighbors2, IndexHNSWfast.h:16,
  * is a field-for-field copy over HNSWfast — this covers both):
  * approximate each stored vector as a codebook-weighted
  * combination of ITSELF and its M graph neighbors —
  * `recon_i = beta[code_i][0]·vec_i + Σ_m beta[code_i][m+1]·nbr_im` —
  * and re-rank a search shortlist on the reconstructions
  * (`k_reorder`, IndexHNSW.cpp:334-345). `estimate_code` picks, per
  * vector, the codebook row minimizing the reconstruction error
  * (IndexHNSW.cpp:796, nsq = 1 — the constructor default).
  *
  * Graph source: the reference reads its own HNSW level-0 links; here
  * the neighbor lists are an explicit DataFrame (src, rank, dst) —
  * [[KnnGraph.exact]]'s deterministic kNN graph in the catalog query,
  * so the whole chain is SQL-replayable (the HNSW walk's links are
  * partition-dependent). Nodes with fewer than M neighbors pad with
  * themselves (the reference's `ji < 0 → i`, IndexHNSW.cpp:664).
  *
  * All arithmetic is double (the repo's oracle-parity float policy);
  * reconstruction never shuffles the base more than the one
  * neighbor-vector equi-join + one grouped vector-sum.
  */
object ReconstructFromNeighbors {

  /** Deterministic k-row codebook for M neighbors (k <= M): row j is
    * `self + 0.1·(n_{j+1} − n_{j+2 mod M})` — the reconstruction
    * error is 0.01·‖n_{j+1} − n_{j+2}‖², so `estimate_code`'s argmin
    * picks the row whose consecutive neighbor PAIR is closest: a
    * genuinely data-dependent choice. (Any pure convex blend toward
    * neighbors degenerates on generic data — the nearest neighbor or
    * the largest self-weight always wins; the reference's
    * regression-trained codebooks are equally arbitrary weight
    * matrices, IndexHNSW.h:37 `codebook`.) */
  def smoothingCodebook(k: Int, m: Int): Array[Array[Float]] = {
    require(k <= m, s"k=$k rows need k <= M=$m neighbors")
    Array.tabulate(k) { j =>
      Array.tabulate(m + 1)(i =>
        if (i == 0) 1f
        else if (i == j + 1) 0.1f
        else if (i == ((j + 1) % m) + 1) -0.1f
        else 0f)
    }
  }

  /** Per-id table of [self, neighbor 1..M] vectors as array<array<
    * double>>, neighbor order = graph rank, self-padded to M+1. */
  private def neighborTable(base: DataFrame, graph: DataFrame, m: Int,
      idCol: String, vecCol: String): DataFrame = {
    val nbrs = graph.filter(col("rank") <= m)
      .select(col("src").as(idCol), col("rank").cast("int").as("_pos"),
        col("dst").as("_nid"))
      .join(base.select(col(idCol).as("_nid"),
        col(vecCol).cast("array<double>").as("_nv")), "_nid")
      .select(col(idCol), col("_pos"), col("_nv"))
    val self = base.select(col(idCol), lit(0).as("_pos"),
      col(vecCol).cast("array<double>").as("_nv"))
    self.unionByName(nbrs)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("_pos"), col("_nv")))).as("_ps"))
      .select(col(idCol),
        transform(col("_ps"), p => p.getField("_nv")).as("_tbl"))
      // pad short tables with the self vector (reference ji < 0 → i)
      .withColumn("_tbl", concat(col("_tbl"),
        array_repeat(element_at(col("_tbl"), 1), lit(m + 1) - size(col("_tbl")))))
  }

  private def reconCol(tbl: Column, beta: Array[Float]): Column =
    beta.indices.map(mi =>
      transform(element_at(tbl, mi + 1), x => x * lit(beta(mi).toDouble)))
      .reduce((a, b) => zip_with(a, b, (x, y) => x + y))

  private def l2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** `add_codes` + `reconstruct` (IndexHNSW.cpp:844,639): per id, the
    * argmin codebook row and its reconstruction. Output
    * (id, code: int, rvec: array<double>, err: double). */
  def encode(base: DataFrame, graph: DataFrame,
      codebook: Array[Array[Float]],
      idCol: String = "id", vecCol: String = "vec"): DataFrame = {
    val m = codebook.head.length - 1
    require(codebook.forall(_.length == m + 1), "ragged codebook")
    val tbl = neighborTable(base, graph, m, idCol, vecCol)
      .join(base.select(col(idCol), col(vecCol).cast("array<double>").as("_v")), idCol)
    val withRecons = codebook.indices.foldLeft(tbl) { (df, j) =>
      df.withColumn(s"_r$j", reconCol(col("_tbl"), codebook(j)))
        .withColumn(s"_e$j", l2(col("_v"), col(s"_r$j")))
    }
    // argmin over (err, j) — the struct array's natural ordering
    val best = array_min(array(codebook.indices.map(j =>
      struct(col(s"_e$j").as("e"), lit(j).as("j"))): _*))
    val coded = withRecons.withColumn("_b", best)
      .withColumn("code", col("_b.j"))
      .withColumn("err", col("_b.e"))
    val rvec = codebook.indices.map(j => (j, col(s"_r$j")))
      .foldRight(lit(null).cast("array<double>"): Column) {
        case ((j, r), acc) => when(col("code") === j, r).otherwise(acc)
      }
    coded.select(col(idCol), col("code"), rvec.as("rvec"), col("err"))
  }

  /** k_reorder re-rank (IndexHNSW.cpp:334-345): the top `kReorder`
    * rows of a (qid, rank, id, dist) shortlist get their distances
    * recomputed against the reconstructions and re-sorted among
    * themselves; rows beyond keep their original rank and distance. */
  def rerank(stage1: DataFrame, queries: DataFrame, recon: DataFrame,
      kReorder: Int, queryId: String = "qid",
      queryVec: String = "qvec"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val head = stage1.filter(col("rank") <= kReorder)
      .join(recon.select(col("id"), col("rvec")), "id")
      .join(broadcast(queries.select(col(queryId), col(queryVec))), queryId)
      .select(col(queryId), col("id"),
        l2(col(queryVec).cast("array<double>"), col("rvec")).as("dist"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryId)).orderBy(col("dist"), col("id")))
        .cast("long"))
    val tail = stage1.filter(col("rank") > kReorder)
    head.select(col(queryId), col("rank"), col("id"), col("dist"))
      .unionByName(tail.select(col(queryId), col("rank"), col("id"), col("dist")))
  }
}
