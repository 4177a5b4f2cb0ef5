package graft

import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  test("minhash-estimated jaccard tracks the exact jaccard (mean abs err < 0.05)") {
    val r = SparkEntry.queries("q_minhash_est_error")(spark, sf).head()
    assert(r.getAs[Long]("n_pairs") > 0)
    assert(r.getAs[Double]("mean_abs_err") < 0.05,
      s"64-perm sketch mean error too high: $r")
  }

  test("approx percentiles honor the GK rank contract (r4: in-query booleans)") {
    // the error bound moved INTO the query as contract booleans (oracled
    // as TRUE rows); the spec asserts they actually hold on the fixture
    val rows = SparkEntry.queries("q_approx_percentiles")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p50_rank_ok") && r.getAs[Boolean]("p95_rank_ok"),
        s"GK rank contract violated for ${r.getAs[String]("l_returnflag")}")
      assert(r.getAs[Double]("exact_p50") < r.getAs[Double]("exact_p95"))
    }
  }

  test("approx_count_distinct honors the HLL 3-sigma contract (r4: in-query boolean)") {
    val rows = SparkEntry.queries("q_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_3sigma"),
        s"HLL error contract violated for ${r.getAs[String]("l_returnflag")}")
      assert(r.getAs[Long]("exact_orders") > 0L)
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
