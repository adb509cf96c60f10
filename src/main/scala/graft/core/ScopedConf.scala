package graft.core

import org.apache.spark.sql.SparkSession

/** Session-conf scoping for DATA-DERIVED tiny-execution windows (r20).
  *
  * Several operators train/iterate over inputs whose size is known
  * exactly before the work starts (k-means' capped train sample,
  * nnDescent's candidate volume, the io-matrix's fixed 490-row slice).
  * When that volume sits far below the session's shuffle width, every
  * exchange runs as a cluster-width stage of near-empty tasks and AQE
  * materializes each stage as its own job — pure scheduling latency.
  * `tinyShuffle` scopes `spark.sql.shuffle.partitions` to the derived
  * count and disables AQE for the duration, restoring both after.
  *
  * Scale-safety contract for CALLERS: the partition count must be
  * DERIVED from the measured input (rows/bytes) and clamped to the
  * session value — at real scale the clamp saturates and the scope is
  * a no-op (callers skip it entirely via [[tinyParts]] returning the
  * session value). Never pass a constant tuned to a core count.
  *
  * Concurrency: set/restore touches the shared session conf, so
  * concurrent scopes are only safe when they write IDENTICAL values
  * (the io-matrix pool case — every lifecycle derives partitions=1
  * from the same fixed slice). Sequential catalog execution is the
  * normal case.
  */
object ScopedConf {

  /** Derived shuffle-partition count for `rows` input rows at
    * `rowsPerPartition` granularity, clamped to [1, session]. */
  def tinyParts(spark: SparkSession, rows: Long,
      rowsPerPartition: Long = 1L << 16): Int = {
    val session = spark.sessionState.conf.numShufflePartitions
    val n = math.ceil(rows.toDouble / math.max(1L, rowsPerPartition)).toLong
    math.max(1L, math.min(session.toLong, n)).toInt
  }

  /** Runs `f` with shuffle partitions pinned to `parts` and AQE off,
    * restoring both after; a no-op when `parts` is not below the
    * session value (the at-scale case). Actions must complete inside
    * `f` — lazily-evaluated plans escape the scope. */
  def tinyShuffle[A](spark: SparkSession, parts: Int)(f: => A): A =
    if (parts >= spark.sessionState.conf.numShufflePartitions) f
    else withConfs(spark,
      "spark.sql.shuffle.partitions" -> parts.toString,
      "spark.sql.adaptive.enabled" -> "false")(f)

  /** Set the given session confs, run `f`, restore previous values. */
  def withConfs[A](spark: SparkSession, pairs: (String, String)*)(f: => A): A = {
    val prev = pairs.map { case (key, _) => key -> spark.conf.getOption(key) }
    pairs.foreach { case (key, v) => spark.conf.set(key, v) }
    try f finally prev.foreach {
      case (key, Some(v)) => spark.conf.set(key, v)
      case (key, None) => spark.conf.unset(key)
    }
  }
}
