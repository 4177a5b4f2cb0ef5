package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gap-based sessionization over an event stream: a new session starts when
  * the gap to the previous event of the same user exceeds `gapSeconds`.
  *
  * Batch formulation = lag + running sum over a per-user window: one hash
  * shuffle on the user key, then sorted within partitions — the canonical
  * scalable layout (users are independent; skewed power-users are bounded by
  * per-user event counts, and AQE skew-split covers the rest). The streaming
  * twin lives in [[graft.streaming.EventSessions]] via
  * `flatMapGroupsWithState`.
  */
object Sessionize {

  /** Epoch-microsecond view of a timestamp column. The cast to
    * TimestampType first makes this legal for TIMESTAMP_NTZ inputs (the
    * driver fixtures are µs-without-timezone parquet, which Spark 4 reads
    * as NTZ and refuses to cast to numeric directly); with the engine's
    * fixed UTC session timezone the NTZ→LTZ cast is value-preserving, and
    * on an already-LTZ column it is a no-op. Integer micros arithmetic
    * also stays inside whole-stage codegen, unlike a double round-trip.
    */
  private def epochMicros(c: Column): Column = unix_micros(c.cast(TimestampType))

  def withSessionIds(events: DataFrame, userCol: String, tsCol: String,
      tieBreak: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieBreak))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(
      prev.isNull ||
        (epochMicros(col(tsCol)) - epochMicros(prev)) > lit(gapSeconds * 1000000L),
      lit(1)).otherwise(lit(0))
    events
      .withColumn("session_seq", sum(isNew).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-user session statistics: session count and event count. */
  def userSessionStats(events: DataFrame, userCol: String, tsCol: String,
      tieBreak: String, gapSeconds: Long): DataFrame =
    withSessionIds(events, userCol, tsCol, tieBreak, gapSeconds)
      .groupBy(col(userCol))
      .agg(max(col("session_seq")).cast(LongType).as("n_sessions"),
        count(lit(1)).as("n_events"))
}
