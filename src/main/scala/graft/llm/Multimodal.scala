package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque
  * BinaryType columns with typed metadata; decode / feature-extract
  * runs batched inside mapPartitions so a real decoder (image/audio
  * libs are not in this container) can be dropped into [[decodeStub]]
  * without touching the dataflow. Schema, partitioning, batching and
  * the typed boundary are real and tested; only the pixel/sample
  * decoding is faked deterministically from the bytes.
  */
object Multimodal {

  /** (id, media bytes, kind) — the opaque-payload row. */
  case class MediaRow(id: Long, media: Array[Byte], kind: String)

  /** Extracted feature row; `features` is the embedding-like output. */
  case class MediaFeatures(id: Long, kind: String, n_bytes: Long,
      f_first: Double, f_last: Double, features: Array[Float])

  /** STUB decoder — a real implementation would decode image/audio and
    * run a feature extractor per batch; this one derives deterministic
    * features from the raw bytes so the pipeline is testable. */
  private[llm] def decodeStub(r: MediaRow): MediaFeatures = {
    val n = r.media.length
    val first = if (n > 0) (r.media(0) & 0xff).toDouble else 0.0
    val last = if (n > 0) (r.media(n - 1) & 0xff).toDouble else 0.0
    // fake 8-dim "embedding": byte histogram over 8 buckets, L1-normalized
    val hist = new Array[Float](8)
    var i = 0
    while (i < n) { hist((r.media(i) & 0xff) >> 5) += 1f; i += 1 }
    if (n > 0) { var j = 0; while (j < 8) { hist(j) /= n; j += 1 } }
    MediaFeatures(r.id, r.kind, n.toLong, first, last, hist)
  }

  /** Batched feature extraction over (id, media, kind) columns.
    * Batching shape mirrors a GPU/py decoder: fixed-size groups per
    * partition, one decoder call per batch. */
  def extractFeatures(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] =
      df.select(col("id"), col("media"), col("kind")).as[MediaRow]
    typed.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch => batch.iterator.map(decodeStub) }
    }.toDF()
  }
}
