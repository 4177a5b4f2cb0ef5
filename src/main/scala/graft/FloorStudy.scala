package graft

import org.apache.spark.sql.SparkSession

/** Shuffle-floor decomposition of the bench's "weak list" (r8 verdict
  * item 3, extended with the r9 scalar chains): the queries whose sf0.1
  * wall time sits >2× their DuckDB
  * oracle are all multi-exchange shapes against sub-second oracles — the
  * claim to PROVE (not assert) is that the residual after subtracting the
  * session's measured per-exchange floor is small, i.e. the ratio is
  * harness constant, not plan cost. At real scale the floor amortizes to
  * zero; plan cost does not — so the decomposition is exactly the
  * 100 TB-relevance split.
  *
  * Protocol mirrors graft.Bench: warmup + min-of-3 per query, the same
  * job/shuffle calibration probes, exchange counts read from the
  * POST-EXECUTION adaptive plan (what actually ran, not the initial
  * plan), ReusedExchange excluded (a reused exchange reads existing
  * shuffle files — no new floor paid).
  *
  * Output: one JSON line, captured by the caller (the r9-early
  * five-query run lives in SCALING_R9_FLOOR.json; the extended ten-query
  * run in SCALING_R9_FLOOR2.json), summarized in SCALING.md.
  */
object FloorStudy {

  private val weak = Seq(
    "q_dedup_spans", "q_star_revenue", "q_paragraph_dedup_incremental",
    "q_text_analyze", "q_sql_tpch_q18",
    // r9 additions: the new scalar-chain queries sit at sub-second
    // absolute times against fast (sub-250 ms) DuckDB replays —
    // decompose them the same way so the ratio reads as floor or
    // zero-exchange compute, not plan cost
    "q_license_detect", "q_pii_planted", "q_html_extract",
    "q_gopher_rules", "q_robots_filter",
    // r10 additions (r9 verdict item #4): the heavy weak-list rows that
    // never got a floor row — bigram LM (one corpus repartition feeding
    // window AND agg), contamination score (broadcast eval probe), and
    // the per-job-floor triangle count
    "q_bigram_logprob", "q_contamination_score", "q_triangle_count",
    "q_text_ngram_repetition")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = StudySession.build()
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
      "region", "events", "documents", "embeddings")
      .foreach(t => scala.util.Try(Tables(spark, sfDir, t).count()))

    def timeNoop(build: () => org.apache.spark.sql.DataFrame): Double = {
      build().write.format("noop").mode("overwrite").save() // warmup
      (1 to 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        build().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    import org.apache.spark.sql.functions.{col => fcol}
    val jobFloor = timeNoop(() =>
      spark.range(0, 1000000, 1, cpus.toInt).toDF("id"))
    val shuffleFloor = timeNoop(() =>
      spark.range(0, 1000000, 1, cpus.toInt)
        .groupBy(fcol("id") % 1000).count())

    val rows = weak.map { name =>
      val sec = timeNoop(() => SparkEntry.queries(name)(spark, sfDir))
      // post-execution adaptive plan: execute THROUGH this DataFrame's own
      // QueryExecution (a write would plan a fresh one), then read the
      // finalized stages
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.toRdd.count(): Unit
      val plan = df.queryExecution.executedPlan.toString
      // paid shuffles = DISTINCT materialized shuffle stages in the final
      // adaptive plan (a reused stage repeats its id — distinct ids count
      // the shuffle files written once); non-AQE subplans fall back to
      // counting Exchange nodes directly
      val stageIds =
        "ShuffleQueryStage (\\d+)".r.findAllMatchIn(plan).map(_.group(1)).toSet
      val paid = if (stageIds.nonEmpty) stageIds.size
        else "Exchange (hash|range|SinglePartition)".r.findAllIn(plan).size
      val floorEst = paid * shuffleFloor + jobFloor
      val residual = math.max(0.0, sec - floorEst)
      (name, sec, paid, floorEst, residual)
    }

    val qs = rows.map { case (n, s, e, f, r) =>
      s""""$n":{"sec":${f"$s%.3f"},"exchanges":$e,"floor_est":${
        f"$f%.3f"},"residual":${f"$r%.3f"}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"floor_decomposition","sf":"$sfDir","job_floor":${
      f"$jobFloor%.3f"},"shuffle_floor":${f"$shuffleFloor%.3f"},"queries":$qs}""")
    spark.stop()
  }
}
