package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key workloads.
  *
  * AQE's skew-join splitting handles most cases at runtime; these helpers
  * cover the two patterns AQE cannot fix:
  *
  *  1. A skewed AGGREGATION (one giant group): pre-aggregate under a salt,
  *     then merge — two shuffles, but the first spreads the hot key over
  *     `saltBuckets` reducers instead of melting one.
  *  2. A skewed broadcast-infeasible JOIN against a small-but-hot dim:
  *     replicate the small side per salt bucket so the hot key's rows
  *     spread across buckets.
  *
  * Both are algebraic rewrites: results are identical to the unsalted
  * plans for decomposable aggregates (sum/count/min/max).
  */
object Skew {

  /** Salted two-phase sum/count aggregation.
    *
    * @param aggs (outputName, inputColumn) pairs; each is summed. count(*)
    *             is always emitted as `n_rows`.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      aggs: Seq[(String, Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"),
        aggs.map { case (name, c) => sum(c).as(s"__$name") }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n_rows"),
        aggs.map { case (name, _) => sum(col(s"__$name")).as(name) }: _*)
  }

  /** Salted equi-join: spread a hot left key over `saltBuckets` partitions
    * by replicating the (small) right side once per bucket. Correct for any
    * join type whose semantics survive right-side duplication under the
    * added salt-equality condition (inner/left_outer on distinct right keys).
    */
  def saltedJoin(leftBig: DataFrame, rightSmall: DataFrame, key: String,
      saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    val l = leftBig.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val r = rightSmall.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
