package graft

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
