package graft.ops

import org.apache.spark.sql.functions.col

class RangeJoinSpec extends graft.SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("point-in-interval: inclusive bounds, cross-bin intervals, no-match points") {
    val intervals = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-10 00:00:00")),
      (2L, ts("2024-01-05 00:00:00"), ts("2024-02-20 00:00:00")), // spans bins
      (3L, ts("2024-03-01 00:00:00"), ts("2024-03-02 00:00:00"))
    ).toDF("iv_id", "st", "en")
    val points = Seq(
      (10L, ts("2024-01-01 00:00:00")), // == start (inclusive)
      (11L, ts("2024-01-10 00:00:00")), // == end (inclusive)
      (12L, ts("2024-01-07 12:00:00")), // inside 1 and 2
      (13L, ts("2024-02-15 00:00:00")), // inside 2 only (different bin)
      (14L, ts("2024-06-01 00:00:00"))  // matches nothing
    ).toDF("pt_id", "pt")
    val got = RangeJoin.pointInInterval(points, "pt", intervals, "st", "en",
      binSeconds = 7L * 86400L)
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 1L), (11L, 1L), (11L, 2L), (12L, 1L), (12L, 2L),
      (13L, 2L)), s"got $got")
    // equivalence with the naive range join on the same data
    val naive = points.join(intervals,
      col("pt") >= col("st") && col("pt") <= col("en"))
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(got == naive)
  }
}

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("backward as-of: latest right row at or before each left ts, per key") {
    val quotes = Seq(
      ("A", ts("2024-01-01 00:00:00"), 10.0),
      ("A", ts("2024-01-03 00:00:00"), 12.0),
      ("B", ts("2024-01-02 00:00:00"), 5.0))
      .toDF("sym", "qts", "px")
    val events = Seq(
      (1L, "A", ts("2024-01-02 12:00:00")), // → A@01-01 (10.0)
      (2L, "A", ts("2024-01-03 00:00:00")), // equality matches → A@01-03 (12.0)
      (3L, "B", ts("2024-01-05 00:00:00")), // → B@01-02 (5.0)
      (4L, "B", ts("2024-01-01 00:00:00")), // no earlier quote → dropped (inner)
      (5L, "C", ts("2024-01-02 00:00:00"))) // unknown key → dropped
      .toDF("id", "sym", "ets")

    val out = AsOfJoin.backward(events, quotes, "sym", "ets", "qts")
      .select("id", "px").as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 10.0, 2L -> 12.0, 3L -> 5.0))
  }

  test("outer variant keeps unmatched left rows with null payload") {
    val quotes = Seq(("A", ts("2024-01-02 00:00:00"), 1.0)).toDF("sym", "qts", "px")
    val events = Seq((1L, "A", ts("2024-01-01 00:00:00"))).toDF("id", "sym", "ets")
    val out = AsOfJoin.backward(events, quotes, "sym", "ets", "qts", inner = false)
    assert(out.count() == 1)
    assert(out.head().isNullAt(out.head().fieldIndex("px")))
  }
}
