package graft

import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  test("minhash-estimated jaccard tracks the exact jaccard (mean abs err < 0.05)") {
    val r = SparkEntry.queries("q_minhash_est_error")(spark, sf).head()
    assert(r.getAs[Long]("n_pairs") > 0)
    assert(r.getAs[Double]("mean_abs_err") < 0.05,
      s"64-perm sketch mean error too high: $r")
  }

  test("approx percentiles stay within 1% of the exact values") {
    val rows = SparkEntry.queries("q_approx_percentiles")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq(("approx_p50", "exact_p50"), ("approx_p95", "exact_p95")).foreach {
        case (a, e) =>
          val (approx, exact) = (r.getAs[Double](a), r.getAs[Double](e))
          val err = math.abs(approx - exact) / exact
          assert(err < 0.01, s"GK sketch off by ${err * 100}%: $approx vs $exact")
      }
    }
  }

  test("approx_count_distinct stays within 10% of the exact count") {
    val rows = SparkEntry.queries("q_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) =
        (r.getAs[Long]("approx_orders"), r.getAs[Long]("exact_orders"))
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.10, s"HLL estimate off by ${err * 100}%: $approx vs $exact")
    }
  }
}

/** Smoke: every declared query runs and returns rows on sf0.001 (the
  * cell-level oracle comparison runs through graft.Verify + DuckDB in the
  * driver; see scripts/oracle_check.py for the local mirror).
  */
class EntrySmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }
}
