package graft

import org.apache.spark.sql.functions._

/** Iteration-slope decomposition of `q_pagerank` (r9 verdict item #4):
  * time the SAME query at iters = 0..3 on the same warmed session — the
  * slope is the per-round cost (the AQE stage-barrier floor the r5/r6
  * studies identified), the intercept is graph setup + top-k. Together
  * with the quiet-box interleaved A/B (WeakRecert) and the decade study
  * (SCALING_PAGERANK.json: sub-linear growth at constant plan shape),
  * this pins the sf0.1 ratio as per-round harness floor × a 3-round
  * loop over a tiny graph — a constant that amortizes with graph size,
  * not plan cost. Output: one JSON line.
  */
object PageRankFloor {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = StudySession.build()
    Seq("lineitem", "orders").foreach(t =>
      scala.util.Try(Tables(spark, sfDir, t).count()))
    def build(iters: Int) = {
      val edges = Tables.lineitem(spark, sfDir)
        .where(col("l_orderkey") % 5 === 0)
        .join(Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + lit(1000000L)).as("dst"))
      graft.ops.PageRank.runFixedPoint(edges, "src", "dst", iters = iters)
        .orderBy(col("rank_fp").desc, col("id")).limit(25)
        .select(col("id"), col("rank_fp"))
    }
    def time(iters: Int): Double = {
      (1 to 2).foreach(_ =>
        build(iters).write.format("noop").mode("overwrite").save()) // warm
      (1 to 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        build(iters).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val cells = Seq(0, 1, 2, 3).map(i => i -> time(i))
    val slope = (cells(3)._2 - cells(1)._2) / 2.0 // rounds 2+3 average
    val qs = cells.map { case (i, s) => s""""iters_$i":${f"$s%.3f"}""" }
      .mkString(",")
    println(s"""{"metric":"pagerank_iteration_floor","sf":"$sfDir",$qs,""" +
      s""""per_round_sec":${f"$slope%.3f"}}""")
    spark.stop()
  }
}
