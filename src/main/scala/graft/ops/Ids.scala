package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed stable-id assignment: give every row its exact global rank
  * under a total order WITHOUT a single-partition global window.
  *
  * `row_number() OVER (ORDER BY …)` — the obvious formulation — plans one
  * window over ONE partition: the whole dataset funnels through a single
  * task, the canonical 100-TB serialization point. The scalable shape is:
  *
  *  1. `repartitionByRange` on the order columns (range-partitioned total
  *     order across tasks),
  *  2. sort within each partition,
  *  3. `zipWithIndex`: one lightweight count job over the partitions, then
  *     each task adds its partition's start offset — ids are assigned in
  *     parallel, consecutively, in global order.
  *
  * The result is bit-identical to the global window's rank (ids depend
  * only on the total order, not on where range boundaries land), which is
  * exactly what the DuckDB oracle checks.
  */
object Ids {

  /** Append `idCol` = 0-based global rank under `orderCols` (extend the
    * ordering until UNIQUE or ranks are nondeterministic).
    */
  def globalRank(df: DataFrame, orderCols: Seq[String], idCol: String = "rid",
      partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
            else spark.sparkContext.defaultParallelism
    val cols = orderCols.map(col)
    val sorted = df.repartitionByRange(n, cols: _*).sortWithinPartitions(cols: _*)
    val schema = StructType(sorted.schema.fields :+ StructField(idCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rdd, schema)
  }
}
