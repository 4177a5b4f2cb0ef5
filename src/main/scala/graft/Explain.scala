package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: dumps `explain("formatted")` for the named
  * queries (or a representative default set) so scan pushdown, join
  * strategies, and codegen spans can be audited. Not part of the driver
  * contract — a development tool.
  *
  * Usage: runMain graft.Explain <sfDir> [q1,q2,...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("q_scan_pushdown", "q1_pricing_summary", "q_star_revenue",
        "q_lag_change", "q_asof_bars", "q_dedup_ngram_jaccard",
        "q_ann_bruteforce", "q_stock_enrich")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
