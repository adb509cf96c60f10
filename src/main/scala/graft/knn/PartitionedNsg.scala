package graft.knn

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.topk

/** Distributed approximate kNN via per-partition in-memory NSG graphs
  * — the capability answer to the reference's IndexNSG
  * (faiss/IndexNSG.h:26, faiss/impl/NSG.cpp:679) and, with
  * `pruneToNsg = false`, IndexNNDescent searched as an index
  * (faiss/IndexNNDescent.h:23) — under the same IndexShards pattern as
  * [[PartitionedHnsw]] (SURVEY §7: a single global graph build is
  * anti-dataflow; per-partition graphs inside mapPartitions are the
  * scalable re-expression).
  *
  * Each partition builds a private [[LocalNsg]] and answers every
  * broadcast query locally; per-partition top-k results merge through
  * the same bounded-heap aggregate as every other search path. The
  * base never shuffles (beyond the one-time CPU-spread repartition),
  * queries broadcast once, and each partition costs
  * O(|part|·(GK·log|part| + buildL)) build + O(Q·searchL) search — at
  * 1000 executors the graphs build in parallel and stay executor-sized.
  *
  * Accuracy: every partition is searched, so sharding loses no
  * candidates (unlike IVF pruning); recall is single-node NSG recall
  * at the same searchL. searchL >= max partition size degenerates to
  * exact (LocalNsg seeds the full pool), which is the driver-gated
  * bit-for-bit check `nsg_exact_search` uses.
  */
object PartitionedNsg {

  /** Approximate top-k join. Output (qid, rank, id, dist), like
    * [[Knn.knnJoin]]. `queries` must be driver-collectable (same
    * contract as the broadcast-NLJ exact path). */
  def knnJoin(queries: DataFrame, base: DataFrame, k: Int,
      gk: Int = 32, r: Int = 32, buildL: Int = 64, searchL: Int = 64,
      pruneToNsg: Boolean = true,
      queryId: String = "qid", queryVec: String = "qvec",
      baseId: String = "id", baseVec: String = "vec",
      filter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val spark = base.sparkSession
    val qArr: Array[(Long, Array[Float])] = queries
      .select(col(queryId).cast("long"), col(queryVec))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val bq = spark.sparkContext.broadcast(qArr)
    // graph build is CPU-bound: never inherit a narrow file-split
    // partitioning (same rationale as PartitionedHnsw / Dedup.widen).
    // `filter` = IDSelector / remove_ids semantics, pushed below the
    // build (see PartitionedHnsw.knnJoin).
    val target = spark.sparkContext.defaultParallelism
    val filtered = filter.map(base.filter).getOrElse(base)
    val spread =
      if (filtered.rdd.getNumPartitions >= target) filtered
      else filtered.repartition(target)
    val cand = spread.select(col(baseId).cast("long"), col(baseVec))
      .rdd.mapPartitionsWithIndex { (pi, it) =>
        val rows = it.map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val g = new LocalNsg(rows.map(_._1), rows.map(_._2),
            gk = gk, r = r, buildL = buildL, prune = pruneToNsg,
            seed = 42L + pi)
          bq.value.iterator.flatMap { case (qid, qv) =>
            g.search(qv, k, searchL).iterator.map { case (id, d) => Row(qid, id, d) }
          }
        }
      }
    PartitionedHnsw.mergeShards(spark, cand, k, queryId, baseId)
  }

  /** SQ8-storage variant (IndexNSGSQ, faiss/IndexNSG.h:91): trains the
    * per-dimension SQ8 range on the base, encodes once, and each
    * partition builds its NSG OVER THE CODES ([[LocalNsgSq]] — d bytes
    * per stored vector instead of 4d, decode inside the distance).
    * Search is the same asymmetric ADC kernel as the flat SQ8 scan, so
    * searchL >= partition size reproduces
    * [[graft.index.SqIndex.search]] exactly — the same
    * exact-degenerate contract as [[PartitionedHnsw.knnJoinSq]]. */
  def knnJoinSq(queries: DataFrame, base: DataFrame, k: Int,
      gk: Int = 32, r: Int = 32, buildL: Int = 64, searchL: Int = 64,
      queryId: String = "qid", queryVec: String = "qvec",
      baseId: String = "id", baseVec: String = "vec",
      rangeStat: String = "minmax", rsArg: Double = 0.0): DataFrame = {
    val spark = base.sparkSession
    val qArr: Array[(Long, Array[Float])] = queries
      .select(col(queryId).cast("long"), col(queryVec))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val bq = spark.sparkContext.broadcast(qArr)
    val (vmin, vdiff) =
      graft.index.SqIndex.trainRange(base, baseVec, rangeStat, rsArg)
    import org.apache.spark.sql.graft.shim
    val codes = base.select(col(baseId).cast("long"), shim.col(
      graft.core.SQEncode(shim.expr(col(baseVec)), vmin, vdiff)))
    val target = spark.sparkContext.defaultParallelism
    val spread =
      if (codes.rdd.getNumPartitions >= target) codes
      else codes.repartition(target)
    val cand = spread.rdd.mapPartitionsWithIndex { (pi, it) =>
      val rows = it.map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toArray
      if (rows.isEmpty) Iterator.empty
      else {
        val g = new LocalNsgSq(vmin, vdiff, rows.map(_._1), rows.map(_._2),
          gk = gk, r = r, buildL = buildL, seed = 42L + pi)
        bq.value.iterator.flatMap { case (qid, qv) =>
          g.search(qv, k, searchL).iterator.map { case (id, d) => Row(qid, id, d) }
        }
      }
    }
    PartitionedHnsw.mergeShards(spark, cand, k, queryId, baseId)
  }

  /** PQ-storage variant (IndexNSGPQ, faiss/IndexNSG.h:83): encodes the
    * base with a pre-trained [[graft.index.PqModel]] and each
    * partition builds its NSG OVER THE M-BYTE CODES ([[LocalNsgPq]] —
    * sdc-table build distances, per-query ADC LUT search). searchL >=
    * partition size reproduces the flat
    * [[graft.index.PqIndex.search]] ADC ranking exactly — the same
    * contract as [[PartitionedHnsw.knnJoinPq]]. */
  def knnJoinPq(queries: DataFrame, base: DataFrame, k: Int,
      model: graft.index.PqModel,
      gk: Int = 32, r: Int = 32, buildL: Int = 64, searchL: Int = 64,
      queryId: String = "qid", queryVec: String = "qvec",
      baseId: String = "id", baseVec: String = "vec"): DataFrame = {
    val spark = base.sparkSession
    val qArr: Array[(Long, Array[Float])] = queries
      .select(col(queryId).cast("long"), col(queryVec))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val bq = spark.sparkContext.broadcast(qArr)
    val codes = model.encode(base, baseId, baseVec)
      .select(col("id").cast("long"), col("code"))
    val target = spark.sparkContext.defaultParallelism
    val spread =
      if (codes.rdd.getNumPartitions >= target) codes
      else codes.repartition(target)
    val cb = model.codebooks
    val cand = spread.rdd.mapPartitionsWithIndex { (pi, it) =>
      // id-sorted insertion: PQ distances tie whenever rows share a
      // code; node-index tie-breaks must then resolve by ascending id
      // to match the (dist, id) order of the flat ADC ranking
      val rows = it.map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toArray
        .sortBy(_._1)
      if (rows.isEmpty) Iterator.empty
      else {
        val g = new LocalNsgPq(cb, rows.map(_._1), rows.map(_._2),
          gk = gk, r = r, buildL = buildL, seed = 42L + pi)
        bq.value.iterator.flatMap { case (qid, qv) =>
          g.search(qv, k, searchL).iterator.map { case (id, d) => Row(qid, id, d) }
        }
      }
    }
    PartitionedHnsw.mergeShards(spark, cand, k, queryId, baseId)
  }
}
