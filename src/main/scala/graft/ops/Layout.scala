package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-layout operators — the write-side half of 100 TB performance.
  * A scan can only prune what the layout lets it prove: these operators
  * control file partitioning, row-group ordering (min/max pruning), file
  * sizing, and multi-dimensional clustering (Z-order), all with plain
  * Spark writers — no table-format dependency.
  */
object Layout {

  /** Morton (Z-order) interleave of two non-negative 31-bit keys into one
    * long: bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Rows
    * sorted by the Z-value cluster in BOTH dimensions at once, so range
    * predicates on either key prune parquet row groups — the standard
    * multi-dimensional clustering trick when a single sort column can only
    * serve one predicate.
    *
    * 31 bits per dimension, NOT 32: bit 31 of `b` would land on the
    * long's SIGN bit, making upper-half keys sort NEGATIVE — before all
    * other rows — which destroys exactly the clustering this key exists
    * to provide. Keys ≥ 2^31 alias into the masked range (document or
    * pre-bucket such keys).
    *
    * Pure shift/mask arithmetic (the magic-number bit-spread), fully
    * codegen'd — identical integer semantics on any engine, so the value
    * itself is oracle-checkable.
    */
  def mortonZ(a: Column, b: Column): Column =
    spreadBits(a.cast(LongType)).bitwiseOR(
      shiftleft(spreadBits(b.cast(LongType)), 1))

  /** Spread the low 31 bits of a long to the even bit positions (0, 2, 4,
    * …, 60) — the classic 5-step mask cascade.
    */
  private[ops] def spreadBits(x: Column): Column = {
    val steps = Seq(
      16 -> 0x0000FFFF0000FFFFL,
      8  -> 0x00FF00FF00FF00FFL,
      4  -> 0x0F0F0F0F0F0F0F0FL,
      2  -> 0x3333333333333333L,
      1  -> 0x5555555555555555L)
    steps.foldLeft(x.bitwiseAND(lit(0x7FFFFFFFL))) { case (c, (sh, mask)) =>
      c.bitwiseOR(shiftleft(c, sh)).bitwiseAND(lit(mask))
    }
  }

  /** DuckDB/ANSI SQL text computing the same Morton interleave — the
    * oracle twin of [[mortonZ]] (kept adjacent so the two stay in sync).
    */
  def mortonZSql(a: String, b: String): String = {
    def spread(e: String): String = {
      val steps = Seq(
        16 -> 281470681808895L,      // 0x0000FFFF0000FFFF
        8  -> 71777214294589695L,    // 0x00FF00FF00FF00FF
        4  -> 1085102592571150095L,  // 0x0F0F0F0F0F0F0F0F
        2  -> 3689348814741910323L,  // 0x3333333333333333
        1  -> 6148914691236517205L)  // 0x5555555555555555
      steps.foldLeft(s"(CAST($e AS BIGINT) & 2147483647)") { case (c, (sh, m)) =>
        s"((($c | ($c << $sh)) & $m))"
      }
    }
    s"(${spread(a)} | (${spread(b)} << 1))"
  }

  /** Range-sorted parquet layout: global range partitioning on `sortCols`
    * then an in-partition sort, so every file covers a narrow,
    * non-overlapping key range and its parquet column min/max statistics
    * actually prune. `maxRecordsPerFile` bounds file size without an extra
    * shuffle (the writer rolls files within a task).
    */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String],
      numFiles: Int, maxRecordsPerFile: Long = 0L): Unit = {
    val cols = sortCols.map(col)
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }

  /** Hive-style partitioned write (`path/col=value/…`) — partition
    * pruning for free on every engine that lists directories. Dynamic
    * overwrite replaces only the partitions present in `df`, the
    * idempotent-backfill contract a daily 100 TB pipeline needs (a static
    * overwrite would drop every OTHER day's partitions).
    */
  def writeHivePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Small-file compaction: rewrite a parquet directory into
    * `ceil(bytes / targetFileBytes)` files. Small-file proliferation is
    * the classic slow death of long-lived tables (every query pays
    * per-file open/footer cost); compaction restores scan efficiency
    * without changing content. Returns the file count written.
    */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val backup = new org.apache.hadoop.fs.Path(path + "_compacting_old")
    // CRASH RECOVERY preamble: a prior run that died between its two
    // renames leaves the table absent and the backup holding the ONLY
    // copy — roll it back before anything else. Deleting the "stale"
    // backup first (the pre-r7 order) in that state would destroy the
    // dataset; the backup is only stale once the table itself exists.
    if (!fs.exists(hadoopPath) && fs.exists(backup))
      require(fs.rename(backup, hadoopPath),
        s"compact recovery: could not restore $path from $backup")
    val bytes = fs.getContentSummary(hadoopPath).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "_compacting")
    spark.read.parquet(path)
      .repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // swap via rename-aside, NEVER delete-then-rename: a crash between a
    // delete and the rename would lose the dataset entirely, while a crash
    // here leaves either the old table in place or a recoverable backup
    // directory (renames are atomic on HDFS)
    fs.delete(backup, true) // clear any stale backup (table exists here)
    require(fs.rename(hadoopPath, backup),
      s"compact: could not move $path aside")
    require(fs.rename(tmp, hadoopPath),
      s"compact: could not swap in $tmp (old data preserved at $backup)")
    fs.delete(backup, true)
    fs.listStatus(hadoopPath).count(_.getPath.getName.endsWith(".parquet"))
  }
}
