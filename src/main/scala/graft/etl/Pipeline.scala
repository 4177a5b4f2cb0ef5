package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{BarSource, ConstituentSource}

/** End-to-end orchestration of the reference pipeline (SURVEY §2.11
  * C1–C5): extract constituents → fetch bars → normalize/enrich →
  * consolidate → quality summary → CSV stage → warehouse append with
  * consume-once semantics → verify aggregate.
  *
  * The reference runs these as five Airflow tasks exchanging XCom values;
  * here they are stages of one Spark application exchanging a RunContext.
  * Stage boundaries that were process hops become plan sections; the only
  * true materialization points are the two sinks and the quality action.
  */
object Pipeline {

  /** C2: the values the reference passes through XCom. */
  final case class RunReport(
      nSymbols: Long, nRows: Long,
      minDate: String, maxDate: String,
      stagePath: String, warehousePath: String,
      loadedRows: Long)

  /** C3: retry wrapper for the nondeterministic (source-fetch) stages.
    *
    * Scope: driver-side fetches, source VALIDATION, and the run's FIRST
    * full materialization of the distributed read. Each fetch block
    * forces one probe read (`limit(1).count()`), so a dead/missing/
    * unauthorized source fails inside the retry loop rather than at the
    * first downstream sink; the quality-summary action in [[run]] is also
    * retried, so a transient failure in any OTHER partition of the
    * distributed read (which the probe cannot touch) recovers at the
    * driver level too — matching the reference's whole-task retry
    * semantics. Partition-grain transient I/O beyond that is Spark's own
    * job: task retries (`spark.task.maxFailures`) and stage re-attempts
    * re-run exactly the failed partitions — re-fetching everything at the
    * driver level per task failure would be the wrong granularity at
    * 100 TB.
    */
  @annotation.tailrec
  def retry[T](attempts: Int, delayMs: Long)(f: => T): T =
    util.Try(f) match {
      case util.Success(v) => v
      case util.Failure(e) if attempts > 1 =>
        Thread.sleep(delayMs)
        retry(attempts - 1, delayMs)(f)
      case util.Failure(e) => throw e
    }

  def run(spark: SparkSession,
      constituents: ConstituentSource,
      bars: BarSource,
      start: java.sql.Date, end: java.sql.Date,
      stageDir: String, warehouseDir: String,
      retries: Int = 2, retryDelayMs: Long = 100L,
      maxSymbols: Option[Int] = None): RunReport = {

    // stage 1: extract + clean symbols (C5: hard-fail on empty input;
    // P5: maxSymbols test knob)
    val symbols = StockEtl.cleanSymbols(retry(retries, retryDelayMs) {
      val df = constituents.fetch(spark)
      df.limit(1).count() // validate readability inside the retry scope
      df
    }, maxSymbols = maxSymbols)
    require(symbols.limit(1).count() > 0, "no valid symbols extracted") // DAG:64–65

    // stage 2: fetch + normalize + enrich (one distributed read replaces
    // the reference's ~500-iteration driver loop; C4 tolerance is in the
    // PERMISSIVE source read)
    val raw = retry(retries, retryDelayMs) {
      val df = bars.fetch(spark, symbols, start, end)
      df.limit(1).count() // validate readability inside the retry scope
      df
    }
    // Cached for the run's lifetime: the enriched frame feeds the quality
    // summary AND the CSV stage — without the cache each action re-runs the
    // whole fetch+enrich subtree. Unpersisted before returning (bounded
    // cache ownership).
    val enriched = StockEtl.enrich(StockEtl.normalize(raw))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // stage 3: quality summary (A1–A4, one pass) — its row count IS the
      // C5 empty-input guard (no separate count job, DAG:209–210). First
      // full materialization of the run → retried (see [[retry]] scope);
      // partitions cached by a failed attempt are not recomputed.
      val q = retry(retries, retryDelayMs) {
        StockEtl.qualitySummary(enriched).head()
      }
      val (nRows, nSyms) = (q.getAs[Long]("n_rows"), q.getAs[Long]("n_symbols"))
      require(nRows > 0, "no bars fetched for any symbol")
      val (minD, maxD) = (String.valueOf(q.getAs[Any]("min_date")),
        String.valueOf(q.getAs[Any]("max_date")))

      // stage 4: consolidate + CSV stage sink (S4 option parity)
      val stagePath = s"$stageDir/stock_stage"
      StockEtl.writeCsvStage(StockEtl.consolidate(enriched), stagePath)

      // stage 5: warehouse append + consume-once (S6)
      val loaded = graft.sinks.WarehouseLoad.appendAndPurge(
        spark, stagePath, warehouseDir)
      // stage 6: S7 post-load verification aggregate (DAG:380–386) — the
      // warehouse must actually CONTAIN at least the rows this run
      // appended; a silent short write fails the run here, not downstream
      val v = graft.sinks.WarehouseLoad.verify(spark, warehouseDir)
      require(v.getAs[Long]("total_rows") >= loaded,
        s"post-load verify: warehouse has ${v.getAs[Long]("total_rows")} rows, " +
          s"run appended $loaded")
      RunReport(nSyms, nRows, minD, maxD, stagePath, warehouseDir, loaded)
    } finally enriched.unpersist()
  }
}
