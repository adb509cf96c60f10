package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim
import graft.core.{NearestCentroid, PQEncode}
import graft.functions.{vec_add, vec_sub}

/** Index2Layer (faiss/Index2Layer.h:29: "Same as an IndexIVFPQ without
  * the inverted lists: codes are stored sequentially"; search is
  * deliberately not implemented in the reference, Index2Layer.h:53 —
  * the class is random-access encoded storage, e.g. the backing store
  * for a graph index).
  *
  * Spark shape: a flat (id, list_no, code) DataFrame — NOT partitioned
  * by list_no (that is the whole point vs IVFPQ); the coarse id is
  * part of the payload so any row can be reconstructed independently.
  * At 100 TB this is a plain columnar table: reconstruction is a
  * narrow per-row map (broadcast centroid lookup + in-row PQ decode),
  * no shuffle at all.
  */
class TwoLayerIndex(
    val nlist: Int,
    val centroids: Array[Array[Float]],
    val model: PqModel,
    /** (id, list_no, code) — sequential storage, no list partitioning */
    val codes: DataFrame) {

  private def centDf = {
    val s = codes.sparkSession
    import s.implicits._
    centroids.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
      .toDF("list_no", "_cent")
      .select(col("list_no"), col("_cent").cast("array<float>").as("_cent"))
  }

  /** reconstruct_n (Index2Layer.cpp reconstruct): coarse centroid +
    * PQ-decoded residual, one row per stored vector. */
  def reconstruct: DataFrame =
    codes.join(broadcast(centDf), "list_no")
      .select(col("id"),
        vec_add(col("_cent"), model.decodeCol(col("code"))).as("vec"))
}

object TwoLayerIndex {

  /** Train coarse (nlist k-means) + residual PQ, then encode every
    * row — the `Residual<nlist>,PQ<m>` factory combination
    * (index_factory.cpp:280-287 use_2layer). */
  def build(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, m: Int, ksub: Int = 256,
      niterCoarse: Int = 5, niterPq: Int = 5,
      seed: Long = 1234L): TwoLayerIndex = {
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val km = graft.cluster.KMeans.fit(vecs, "vec",
      graft.cluster.KMeans.Params(k = nlist, niter = niterCoarse, seed = seed))
    val assigned = vecs
      .withColumn("_a", shim.col(NearestCentroid(shim.expr(col("vec")), km.centroids)))
      .withColumn("list_no", col("_a.list_no")).drop("_a")
    val s = df.sparkSession
    import s.implicits._
    val centDf = km.centroids.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }.toDF("list_no", "_cent")
      .select(col("list_no"), col("_cent").cast("array<float>").as("_cent"))
    val residuals = assigned.join(broadcast(centDf), "list_no")
      .select(col("id"), col("list_no"), vec_sub(col("vec"), col("_cent")).as("_res"))
    val pq = Pq.train(residuals.select(col("_res")), "_res", m, ksub,
      niter = niterPq, seed = seed)
    val codes = residuals.select(col("id"), col("list_no"),
      shim.col(PQEncode(shim.expr(col("_res")), pq.codebooks)).as("code"))
    new TwoLayerIndex(nlist, km.centroids, pq, codes)
  }
}
