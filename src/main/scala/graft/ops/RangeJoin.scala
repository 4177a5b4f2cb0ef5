package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Binned range join: point-in-interval matching WITHOUT an equi key.
  *
  * Spark has no native range join; the naive plan for
  * `points JOIN intervals ON pt BETWEEN start AND end` is a broadcast
  * nested loop — quadratic work and a broadcast that must fit in memory.
  * The scalable formulation bins the axis into fixed-width buckets:
  * each interval explodes to the buckets it covers, each point maps to
  * exactly one bucket, and the match becomes an ordinary shuffled
  * EQUI-join on the bucket id (AQE-coalescible, skew-splittable) followed
  * by the exact containment filter. Cost is |points| + Σ(interval
  * length / binWidth) exploded rows + the true-candidate pairs — linear,
  * not quadratic, when intervals are short relative to the axis.
  *
  * Choosing `binSeconds`: about the MEDIAN interval length. Wider bins
  * mean fewer exploded rows but more false candidates per bucket;
  * narrower bins the reverse. A pathologically long interval explodes to
  * length/binWidth rows — cap interval length upstream or widen the bin
  * (the explode is per interval ROW, so the skew is bounded and visible,
  * unlike a hot-key hash join).
  */
object RangeJoin {

  /** Attach to each point every interval containing it:
    * `start <= pt <= end` (inclusive both ends, like SQL BETWEEN).
    * Timestamp columns are compared on epoch seconds.
    *
    * @param binSeconds bucket width on the time axis, in seconds.
    */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    // epoch seconds via an explicit TimestampType hop — NTZ columns reject
    // a direct integral cast
    def secs(c: org.apache.spark.sql.Column) =
      c.cast(org.apache.spark.sql.types.TimestampType).cast(LongType)
    val p = points.withColumn("__bin", floor(secs(col(ptCol)) / binSeconds))
    val i = intervals.withColumn("__bin",
      explode(sequence(
        floor(secs(col(startCol)) / binSeconds),
        floor(secs(col(endCol)) / binSeconds))))
    p.join(i, Seq("__bin"))
      .where(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bin")
  }
}
