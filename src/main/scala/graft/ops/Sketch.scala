package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Count-min sketch as a DataFrame aggregation: approximate per-key counts
  * (heavy hitters) in `depth × width` cells of state, independent of key
  * cardinality.
  *
  * Where it earns its place at 100 TB: an exact `groupBy(key).count()` is
  * fine in batch (two-phase aggregation scales), but a STREAMING top-k over
  * an unbounded key domain (URLs, shingles) accumulates state per key — the
  * sketch's state is d×w cells forever, and the same plan runs in both
  * modes (see the streaming spec: one `groupBy(row_i, bucket).count()`
  * maintained incrementally in complete/update mode).
  *
  * Engine-portable hashing: bucket ids derive from `md5` (identical bytes
  * in Spark and DuckDB), so sketch CELLS and ESTIMATES are bit-identical
  * cross-engine — the sketch itself is oracle-checkable (`q_heavy_hitters`),
  * unlike xxhash-seeded MinHash/SimHash which are declared rows-only.
  * Estimates are overestimates-only by construction (min over d cells, each
  * cell ≥ the true count).
  */
object Sketch {

  /** Bucket id for hash row `i`: first 32 bits of `md5(key || "#i")`,
    * modulo `width`. Non-negative (32-bit value in a long), lowercase-hex
    * md5 on both engines, so `%` agrees cross-engine.
    */
  def cmBucket(key: Column, i: Int, width: Int): Column =
    conv(substring(md5(concat(key, lit(s"#$i"))), 1, 8), 16, 10)
      .cast(LongType) % width

  /** Build the sketch: ONE pass over the data — each row fans out to its
    * `depth` (row, bucket) cells via posexplode, then a two-phase count
    * keyed on the cell id. Map-side partial aggregation bounds the shuffle
    * at partitions × depth × width rows regardless of input size.
    */
  def countMinBuild(df: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 2048): DataFrame =
    df.select(posexplode(
        array((0 until depth).map(i => cmBucket(col(keyCol), i, width)): _*))
        .as(Seq("row_i", "bucket")))
      .groupBy(col("row_i"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for a frame of keys: probe the key's `depth` cells,
    * take the min. `depth`/`width` must match the build. Inner join is
    * safe for keys present in the built data (their cells exist); absent
    * keys estimate as the min of whatever their cells collide with — join
    * left_outer and coalesce to 0 if absent keys must report 0-ish.
    */
  def countMinEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 2048): DataFrame = {
    val probes = keys.select(col(keyCol), posexplode(
        array((0 until depth).map(i => cmBucket(col(keyCol), i, width)): _*))
        .as(Seq("row_i", "bucket")))
    probes
      .join(sketch, Seq("row_i", "bucket"))
      .groupBy(col(keyCol))
      .agg(min(col("cnt")).as("est_count"))
  }
}
