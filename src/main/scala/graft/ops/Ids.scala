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

  /** Append `idCol` = 1-based rank WITHIN each `groupCol` group under
    * `orderCols`, plus `nCol` = the group's row count — the distributed
    * replacement for `row_number() OVER (PARTITION BY g ORDER BY …)` when
    * `g` has CONSTANT cardinality (a returnflag, a status code): that
    * window sorts the whole corpus in #groups tasks regardless of cluster
    * size, the quiet 100-TB straggler. Here the corpus range-partitions on
    * (group, orderCols) — parallelism set by data volume, not group count
    * — via [[globalRank]], and per-group ranks are recovered by
    * subtracting each group's start offset.
    *
    * The offset table is one row per group; its cumulative sum runs as a
    * single-partition window over #groups rows — bounded BY THE SAME
    * assumption that makes this op necessary (constant group cardinality).
    * For high-cardinality groups use a plain window instead: it already
    * parallelizes by group.
    *
    * Ranks among `orderCols` ties are arbitrary-but-consistent (same
    * caveat as [[globalRank]]): extend the ordering until unique if rank
    * positions must be deterministic.
    */
  def groupRank(df: DataFrame, groupCol: String, orderCols: Seq[String],
      idCol: String = "rn", nCol: String = "n"): DataFrame = {
    val ranked = globalRank(df, groupCol +: orderCols, "__grk")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as(nCol))
    // group offsets: Σ counts over groups strictly before this one under
    // the SAME ordering globalRank range-partitioned by (ascending,
    // nulls first — which is also why the offset window and the
    // null-safe join below keep a NULL group as its own group, exactly
    // like the PARTITION BY window this op replaces)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(groupCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offs = counts.withColumn("__off", coalesce(sum(col(nCol)).over(w), lit(0L)))
      .withColumnRenamed(groupCol, "__g")
    ranked.join(broadcast(offs), col(groupCol) <=> col("__g"))
      .withColumn(idCol, col("__grk") - col("__off") + 1)
      .drop("__g", "__grk", "__off")
  }

  /** Append `idCol` = 0-based global rank under `orderCols` (extend the
    * ordering until UNIQUE or ranks are nondeterministic).
    */
  def globalRank(df: DataFrame, orderCols: Seq[String], idCol: String = "rid",
      partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
            else spark.sparkContext.defaultParallelism
    val cols = orderCols.map(col)
    // r12 optimization: the original `rdd.zipWithIndex` + createDataFrame
    // implementation left Tungsten twice per row (InternalRow → Row → new
    // RDD → row-encoded scan), de-columnarizing every downstream consumer
    // and paying zipWithIndex's own count job. Same offsets arithmetic,
    // expressed in columnar expressions instead:
    //  - monotonically_increasing_id() is pid·2^33 + row-in-partition, so
    //    the in-partition rank is `mid - pid·2^33` (document scale bound:
    //    ≥2^33 rows in ONE partition would overflow — 8.6 B rows per task
    //    is far past any sane partitioning, and the range repartition
    //    controls the width right here);
    //  - per-partition start offsets are a tiny aggregate over ≤ n rows,
    //    cumulated in a single-partition window bounded by the partition
    //    COUNT, and broadcast back.
    // Both consumers (offsets + the join probe) re-read the ONE
    // materialized range exchange, so mids agree: the in-partition sort
    // is deterministic given the materialized exchange output — the same
    // property zipWithIndex relied on. Ranks among orderCols ties remain
    // arbitrary-but-consistent (unchanged contract).
    val sorted = df.repartitionByRange(n, cols: _*).sortWithinPartitions(cols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
    val byPid = org.apache.spark.sql.expressions.Window.orderBy(col("__pid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offs = sorted.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(byPid), lit(0L)))
      .select(col("__pid").as("__opid"), col("__off"))
    sorted.join(broadcast(offs), col("__pid") === col("__opid"))
      .withColumn(idCol,
        col("__off") + col("__mid") - col("__pid").cast(LongType) * lit(1L << 33))
      .drop("__pid", "__mid", "__opid", "__off")
  }
}
