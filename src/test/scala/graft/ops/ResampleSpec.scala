package graft.ops

import java.sql.Date

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private val obs = Seq(
    ("A", Date.valueOf("2024-01-01"), Some(10.0)),
    ("A", Date.valueOf("2024-01-04"), Some(20.0)),
    ("B", Date.valueOf("2024-02-10"), Some(5.0)))
    .toDF("k", "d", "v")

  test("dateSpine: per-key dense range from the key's own min/max") {
    val spine = Resample.dateSpine(obs, "k", "d")
      .collect().map(r => (r.getString(0), r.getDate(1).toString))
    assert(spine.count(_._1 == "A") == 4, "A spans 4 days")
    assert(spine.count(_._1 == "B") == 1, "B is a single day")
    assert(spine.contains(("A", "2024-01-02")) && spine.contains(("A", "2024-01-03")))
  }

  test("resampleDailyLocf: gaps carry the prior value; observed rows flagged") {
    val out = Resample.resampleDailyLocf(obs, "k", "d", Seq("v"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out(("A", "2024-01-01")) == ((10.0, true)))
    assert(out(("A", "2024-01-02")) == ((10.0, false)), "gap carries forward")
    assert(out(("A", "2024-01-03")) == ((10.0, false)))
    assert(out(("A", "2024-01-04")) == ((20.0, true)), "new observation replaces")
    assert(out(("B", "2024-02-10")) == ((5.0, true)))
    assert(out.size == 5)
  }
}
