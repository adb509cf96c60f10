package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.topk

/** IndexShards (faiss/IndexShards.h:27): one logical index over a set
  * of independently-built shards — search runs every shard and merges
  * the per-query candidate streams into one top-k. The reference
  * threads shards through a WorkerThread pool and a heap merge; here
  * each shard's search is already a distributed plan, so the merge is
  * a union + one more top-k aggregate — the same shape the TopK
  * partial/merge pair gives every single index, one level up.
  *
  * Shards own their ids (the add_with_ids / successive_ids = false
  * regime — our engine's id-as-column convention makes the id-shift
  * variant a caller-side projection). Expects the standard
  * (qid, rank, id, dist)-ascending search contract.
  */
object Shards {

  def search(shards: Seq[IndexFactory.Built], queries: DataFrame,
      k: Int, nprobe: Int = 1,
      queryId: String = "qid", queryVec: String = "qvec"): DataFrame = {
    require(shards.nonEmpty, "no shards")
    val cand = shards.map(_.search(queries, k, nprobe, queryId, queryVec)
        .select(col(queryId), col("id"), col("dist")))
      .reduce(_ unionByName _)
    cand.groupBy(col(queryId))
      .agg(topk(col("dist"), col("id"), k, asc = true).as("_tk"))
      .select(col(queryId), posexplode(col("_tk")).as(Seq("_pos", "_r")))
      .select(col(queryId), (col("_pos") + 1).cast("long").as("rank"),
        col("_r.id").as("id"), col("_r.dist").as("dist"))
  }
}
