package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals unsalted aggregation") {
    val li = graft.Tables.lineitem(spark, sf)
    val salted = Skew.saltedSum(li, Seq("l_returnflag"), saltBuckets = 8,
      Seq("qty" -> col("l_quantity")))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val plain = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // quantities are integral doubles → sums exact in any order
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join equals plain join (inner, distinct right keys)") {
    val li = graft.Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val oRenamed = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val a = Skew.saltedJoin(li, oRenamed, "l_orderkey", saltBuckets = 4).count()
    val b = li.join(oRenamed, Seq("l_orderkey")).count()
    assert(a == b)
  }

  test("GraftExtensions constructs and injects without error") {
    new graft.GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
