package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Training-shard export: the last step of an LLM data pipeline — a cleaned
  * corpus leaves the engine as N reproducible shards plus a manifest that
  * downstream training (and audits) can trust.
  *
  * Design for 100 TB:
  *  - shard assignment is `pmod(xxhash64(id), nShards)` — a pure function
  *    of the ROW, not of the physical partitioning, so re-running the
  *    export on a differently-partitioned upstream produces byte-identical
  *    shard membership (`maxRecordsPerFile`-style splitting does not);
  *  - one `repartition(shard)` shuffle, then `partitionBy(shard)` — each
  *    reducer writes exactly its shard directory, one file per shard,
  *    sized by choosing nShards ≈ corpus / target_file_size;
  *  - the manifest (per shard: row count + an ORDER-INDEPENDENT content
  *    checksum — the wrapping sum of per-row `xxhash64(to_json(struct))`)
  *    is computed from the SAME aggregation pass shape the engine uses
  *    everywhere (two-phase, map-side combined) and written next to the
  *    shards; `verifyShards` recomputes it from what is actually on disk.
  */
object ShardWriter {

  private def withShard(df: DataFrame, idCol: String, nShards: Int) =
    df.withColumn("__shard", pmod(xxhash64(col(idCol)), lit(nShards.toLong)))

  private def rowDigest(df: DataFrame) = {
    // canonical row representation: JSON of all non-shard columns in NAME
    // order (JSON read-back reorders columns, so frame order is not
    // stable); the wrapping Long sum of digests is order-independent
    // (addition mod 2^64 commutes)
    val cols = df.columns.filterNot(_ == "__shard").sorted.map(col)
    xxhash64(to_json(struct(cols: _*)))
  }

  /** Write `nShards` JSONL shard directories under `outDir` (shard=K/...)
    * plus `outDir/_manifest` (parquet: shard, n_rows, checksum).
    * @return the manifest frame
    */
  def writeShards(df: DataFrame, outDir: String, idCol: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val sharded = withShard(df, idCol, nShards)
    sharded
      .repartition(nShards, col("__shard"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("__shard")
      .json(s"$outDir/shards")
    val manifest = sharded
      .groupBy(col("__shard").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(rowDigest(sharded)).cast(LongType).as("checksum"))
    manifest.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/_manifest")
    manifest
  }

  /** Recompute counts + checksums from the shards ON DISK and join against
    * the stored manifest. A row lost, duplicated, or altered anywhere in
    * the write path surfaces as a mismatch on its shard.
    * @return (shard, n_rows, checksum, disk_n_rows, disk_checksum, ok)
    */
  def verifyShards(spark: org.apache.spark.sql.SparkSession,
      outDir: String): DataFrame = {
    val manifest = spark.read.parquet(s"$outDir/_manifest")
    val disk = spark.read
      .schema(spark.read.json(s"$outDir/shards").schema) // one listing pass
      .json(s"$outDir/shards")
    val recomputed = disk
      .groupBy(col("__shard").cast(LongType).as("shard"))
      .agg(count(lit(1)).as("disk_n_rows"),
        sum(rowDigest(disk)).cast(LongType).as("disk_checksum"))
    manifest.join(recomputed, Seq("shard"), "full_outer")
      .withColumn("ok",
        col("n_rows") === col("disk_n_rows") &&
          col("checksum") === col("disk_checksum"))
  }
}
