package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Backward as-of join: attach to each left row the LATEST right row with
  * `rightTs <= leftTs` for the same key — the canonical financial lookup
  * (event → most recent quote/bar).
  *
  * Spark has no native as-of join; the scalable formulation used here is
  * union-then-carry-forward: tag both inputs, union by name, and carry the
  * right payload as a single struct with one `last(_, ignoreNulls=true)`
  * window over `partitionBy(key).orderBy(ts, side)`. Cost = ONE hash shuffle on the key
  * + an in-partition sort — linear in |L|+|R|, no range-join row explosion,
  * and per-key skew is bounded by that key's own row count (AQE handles the
  * rest). This beats the obvious alternatives at 100 TB: an inequality
  * range join degenerates to a per-key cross product, and a broadcast of
  * the right side assumes it fits in memory.
  */
object AsOfJoin {

  /** @param left      probe side; all its columns are preserved
    * @param right     reference side; every non-key, non-ts column is
    *                  carried onto matching left rows (names must not clash
    *                  with left's)
    * @param keyCol    equi-join key present on both sides
    * @param leftTsCol event-time column on `left`
    * @param rightTsCol event-time column on `right`; also emitted as
    *                  `asof_<rightTsCol>` so callers see WHICH row matched
    * @param inner     true drops left rows with no as-of match (ASOF JOIN
    *                  semantics); false keeps them with null payload
    */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String, inner: Boolean = true): DataFrame = {
    val payload = right.columns.toSeq.filterNot(c => c == keyCol || c == rightTsCol)
    val asofTs = s"asof_$rightTsCol"

    // The whole right payload travels as ONE non-null struct, carried by a
    // single `last(_, ignoreNulls = true)` window. Per-column carry would
    // substitute an OLDER row's value wherever the true as-of-matched row
    // has a legitimately NULL payload field — struct carry preserves that
    // row's nulls (real ASOF JOIN semantics), and runs one window pass
    // instead of one per payload column.
    val r = right.select(
      col(keyCol), col(rightTsCol).cast(TimestampType).as("__ts"),
      lit(0).as("__side"),
      struct((col(rightTsCol).as(asofTs) +: payload.map(col)): _*).as("__p"))
    val l = left
      .withColumn("__ts", col(leftTsCol).cast(TimestampType))
      .withColumn("__side", lit(1))

    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal ts → `>=` (inclusive) match
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = unioned
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val unpacked = (asofTs +: payload).foldLeft(carried) { (df, c) =>
      df.withColumn(c, col("__p").getField(c))
    }
    val result = unpacked.drop("__ts", "__side", "__p")
    if (inner) result.where(col(asofTs).isNotNull) else result
  }
}
