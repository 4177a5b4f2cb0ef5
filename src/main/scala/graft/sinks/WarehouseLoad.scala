package graft.sinks

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Warehouse ingest with the reference's COPY INTO contract (SURVEY §2.1
  * S6–S7): error-tolerant CSV decode, append-only load, consume-once
  * (`PURGE=TRUE`) staged-file deletion after a successful append, and the
  * post-load verification aggregate.
  *
  * The structured-streaming upgrade path (checkpointed
  * `Trigger.AvailableNow`, which subsumes PURGE without deleting inputs)
  * lives in [[graft.streaming.EventsStreaming]]; this sink keeps the
  * batch-exact semantics for parity.
  */
object WarehouseLoad {

  private val numericCols = Seq("Open", "High", "Low", "Close",
    "Close_Change", "Close_Pct_Change", "Daily_Range", "Daily_Range_Pct")

  /** Append the staged CSV into the warehouse parquet table, then delete
    * the consumed staged files (consume-once). Returns rows loaded.
    *
    * The row count comes from an `Observation` attached to the SAME write
    * job — not a separate `count()` action, which would decode the whole
    * staged CSV a second time and could disagree with what was actually
    * appended if the stage changed between the two scans.
    */
  def appendAndPurge(spark: SparkSession, stagePath: String,
      warehouseDir: String): Long = {
    val obs = org.apache.spark.sql.Observation()
    readStaged(spark, stagePath)
      .observe(obs, count(lit(1)).as("n"))
      .write.mode("append").parquet(warehouseDir)
    val n = obs.get("n").asInstanceOf[Long]
    purge(spark, stagePath) // PURGE=TRUE (DAG:378): delete only after success
    n
  }

  /** Coercing casts applied BY NAME to whichever staged columns are
    * present — a stage written without optional columns still types
    * correctly (COPY matches columns by name, not position).
    */
  def readStaged(spark: SparkSession, stagePath: String): DataFrame = {
    val raw = graft.etl.StockEtl.readStagedCsv(spark, stagePath)
    val present = raw.columns.toSet
    val cast = numericCols.filter(present).foldLeft(raw)((df, c) =>
      df.withColumn(c, col(c).cast(DoubleType)))
    val dated = if (present("Date")) cast.withColumn("Date", to_date(col("Date"))) else cast
    if (present("Volume"))
      dated.withColumn("Volume", col("Volume").cast(DoubleType).cast(LongType))
    else dated
  }

  /** Consume-once deletion through the Hadoop FileSystem API — PURGE must
    * work identically on local FS, HDFS, and object stores; a
    * `java.io.File` walk silently no-ops on anything remote.
    */
  private def purge(spark: SparkSession, stagePath: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(stagePath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path) && fs.getFileStatus(path).isDirectory)
      fs.listStatus(path).iterator
        .filter(_.getPath.getName.endsWith(".csv"))
        .foreach(st => fs.delete(st.getPath, false))
  }

  /** S7/A5: the post-load verification aggregate, as a composable frame. */
  def verifyDf(spark: SparkSession, warehouseDir: String): DataFrame =
    spark.read.parquet(warehouseDir).agg(
      count(lit(1)).as("total_rows"),
      countDistinct(col("Symbol")).as("unique_symbols"),
      min(col("Date")).as("earliest_date"),
      max(col("Date")).as("latest_date"))

  def verify(spark: SparkSession, warehouseDir: String): Row =
    verifyDf(spark, warehouseDir).head()
}
