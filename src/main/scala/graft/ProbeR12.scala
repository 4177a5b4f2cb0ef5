package graft

import org.apache.spark.sql.functions._

/** R12 scratch probe: bivar A/B of the two triangle-count plans — the
  * r11 wedge-materializing path⋈closing-edge semi-join vs the r12
  * adjacency-intersect edge iterator — in ONE session, interleaved
  * (cross-variant JIT warmth poisoned a sequential PageRank A/B in r6;
  * interleave-and-jointly-warm is the house rule). Also asserts both
  * plans return the identical count on the fixture, and prints the
  * executed-plan exchange counts per variant. Study tooling — not part
  * of the library surface.
  */
object ProbeR12 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_r12/x10"
    val rounds = if (args.length > 1) args(1).toInt else 3
    val mode = if (args.length > 2) args(2) else "tri"
    val spark = StudySession.build()
    if (mode == "bpe") { bpeAnatomy(spark, sfDir, rounds); spark.stop(); return }
    Seq("lineitem").foreach(t => scala.util.Try(Tables(spark, sfDir, t).count()))

    // the q_triangle_count co-purchase edge stream, verbatim
    def co = {
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_suppkey"))
      li.groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_suppkey")).as("sups"))
        .select(explode(col("sups")).as("u"), col("sups"))
        .select(col("u"), explode(col("sups")).as("v"))
        .where(col("u") < col("v"))
    }
    def adjPlan = graft.ops.Triangles.approxSparsified(co, "u", "v", pInv = 10)
    def wedgePlan = {
      // approxSparsified delegates to countExact (the adj form); rebuild
      // its sampling gate inline so the wedge variant sees the same input
      val pre = co.select(least(col("u"), col("v")).cast("long").as("u"),
          greatest(col("u"), col("v")).cast("long").as("v"))
        .where(col("u") =!= col("v"))
      val sampled = pre.where(
        conv(substring(md5(concat(col("u").cast("string"), lit("_"),
          col("v").cast("string"))), 1, 8), 16, 10)
          .cast("long") % 10 === 0)
      graft.ops.Triangles.countExactWedge(sampled, "u", "v")
    }

    // identical results before timing anything (adjPlan carries the
    // extra est_total column — compare the three shared fields)
    val a = adjPlan.select(col("n_nodes"), col("n_edges"),
      col("n_triangles")).collect()(0)
    val w = wedgePlan.collect()(0)
    require(a == w, s"plan variants disagree: adj=$a wedge=$w")
    println(s"""{"probe":"tri_result","n_nodes":${a.getLong(0)},""" +
      s""""n_edges":${a.getLong(1)},"n_triangles":${a.getLong(2)}}""")

    def once(build: => org.apache.spark.sql.DataFrame): Double = {
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      val t0 = System.nanoTime()
      build.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // joint warmup, then interleaved timed rounds
    once(adjPlan); once(wedgePlan)
    val (aRuns, wRuns) = (1 to rounds).map { _ =>
      (once(adjPlan), once(wedgePlan))
    }.unzip
    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      val plan = df.queryExecution.executedPlan.toString
      "Exchange (hash|range)partitioning".r.findAllIn(plan).length +
        "Exchange SinglePartition".r.findAllIn(plan).length
    }
    def arr(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    println(s"""{"probe":"tri_bivar","sf":"$sfDir","adj_runs":${arr(aRuns)},""" +
      s""""wedge_runs":${arr(wRuns)},"adj_min":${f"${aRuns.min}%.3f"},""" +
      s""""wedge_min":${f"${wRuns.min}%.3f"},"adj_exchanges":${exchanges(adjPlan)},""" +
      s""""wedge_exchanges":${exchanges(wedgePlan)}}""")
    spark.stop()
  }

  /** q_bpe_encode stage decomposition (r11 verdict item #7): the query
    * sits AT the 2× bar (2.42 s vs a 1.16 s oracle at sf0.1) — this
    * times each prefix of the encode so the residual is attributed, not
    * guessed: (a) word-table build + alphabet fetch (the two
    * driver-blocking setup jobs), (b) the merge-replay broadcast side,
    * (c) the corpus pass WITHOUT the per-doc reassembly (explode + join
    * only), (d) the full encode incl. the one reassembly shuffle, (e)
    * the driver query's posexplode projection on top. */
  private def bpeAnatomy(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, rounds: Int): Unit = {
    import graft.ops.{Bpe, TextAnalysis}
    scala.util.Try(Tables(spark, sfDir, "documents").count())
    val docs = Tables.documents(spark, sfDir)
    val merges = SparkEntry.encodeMergesForProbe
    def t(label: String)(build: => org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = {
        spark.sqlContext.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        System.gc()
        val t0 = System.nanoTime()
        build.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val m = (1 to rounds).map(_ => once()).min
      println(f"""{"probe":"bpe_$label","min":$m%.3f}""")
    }
    t("a_wordtable")(Bpe.wordTable(docs, "text"))
    locally {
      var words = Bpe.wordTable(docs, "text")
      merges.foreach { case (l, r) => words = Bpe.applyMerge(words, l, r) }
      val w2 = words
      t("b_merge_replay")(w2)
    }
    locally { // corpus pass, no reassembly: explode + broadcast join
      var words = Bpe.wordTable(docs, "text")
      merges.foreach { case (l, r) => words = Bpe.applyMerge(words, l, r) }
      val wordIds = words.select(col("word"),
        size(col("syms")).as("__n"))
      t("c_explode_join_only")(docs
        .select(col("doc_id"),
          posexplode(TextAnalysis.tokens(col("text"))).as(Seq("wpos", "word")))
        .join(broadcast(wordIds), Seq("word"))
        .groupBy(col("doc_id")).agg(sum(col("__n")).as("n")))
    }
    t("d_full_encode")(Bpe.encode(docs, "doc_id", "text", merges))
    t("e_driver_query")(SparkEntry.queries("q_bpe_encode")(spark, sfDir))
  }
}
