package graft

import org.apache.spark.sql.functions._

/** R11 scratch probe: stage-level decomposition of the two queries the
  * x10 A/B left >2× their oracle (q_bigram_logprob, q_triangle_count).
  * Times each prefix of the plan with the bench protocol (warmup +
  * min-of-3 noop) so the dominating stage is measured, not guessed.
  * Study tooling — not part of the library surface.
  */
object ProbeR11 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_r11/x10"
    val spark = StudySession.build()
    import graft.ops.TextAnalysis.tokens
    Seq("lineitem", "orders", "documents")
      .foreach(t => scala.util.Try(Tables(spark, sfDir, t).count()))
    def t(label: String)(build: => org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        build.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val m = (1 to 3).map { _ =>
        spark.sqlContext.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        System.gc(); once()
      }.min
      println(f"""{"probe":"$label","min":$m%.3f}""")
    }

    // ---- bigram stages ----
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val par = graft.Conf.sizedShufflePartitions(docs, rowMultiplier = 2.0)
    def toked = docs.repartition(par, col("doc_id"))
      .select(col("doc_id"), tokens(lower(col("text"))).as("__t"))
    def bi = toked.where(size(col("__t")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("__t"), lit(1), size(col("__t")) - 1),
        slice(col("__t"), lit(2), size(col("__t")) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("__ab"))
      .select(col("doc_id"), col("__ab.a").as("a"), col("__ab.b").as("b"))
    def tfb = bi.groupBy(col("doc_id"), col("a"), col("b"))
      .agg(count(lit(1)).as("tf"))
    t("bigram_tokenize_only")(docs.select(col("doc_id"),
      size(tokens(lower(col("text")))).as("n")))
    t("bigram_bi")(bi)
    t("bigram_tfb")(tfb)
    locally {
      val cab = tfb.groupBy(col("a"), col("b")).agg(sum(col("tf")).as("cnt_ab"))
      t("bigram_tfb_plus_cab")(cab)
    }
    locally {
      def tfbC = tfb.localCheckpoint(false)
      t("bigram_tfb_checkpointed")(tfbC)
    }
    t("bigram_full")(graft.ops.TextAnalysis.bigramLogProb(docs, "doc_id"))
    locally { // ExactMath ln cost in isolation: ln over the tf rows
      val pxish = tfb.withColumn("__p_x",
        lit(1.0) / (col("tf").cast("double") + lit(1.0)))
      t("bigram_ln_only")(
        graft.functions.ExactMath.lnColumn(pxish, "__p_x", "__lnp"))
    }

    // plan/job anatomy of the two full queries: jobs + stages + tasks
    // during one execution, exchange/reuse counts from the adaptive plan
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks); ()
        }
      })
    def anatomy(label: String)(build: => org.apache.spark.sql.DataFrame): Unit = {
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val df = build
      df.write.format("noop").mode("overwrite").save() // warmup
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      jobs.set(0); stages.set(0); tasks.set(0)
      val df2 = build
      val t0 = System.nanoTime()
      df2.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener drain
      val plan = df2.queryExecution.executedPlan.toString
      val nEx = "Exchange (hash|range)partitioning".r.findAllIn(plan).length +
        "Exchange SinglePartition".r.findAllIn(plan).length
      val nReuse = "ReusedExchange".r.findAllIn(plan).length
      println(f"""{"anatomy":"$label","sec":$sec%.3f,"jobs":${jobs.get},"stages":${stages.get},"tasks":${tasks.get},"exchanges":$nEx,"reused":$nReuse}""")
    }
    anatomy("bigram_full")(
      graft.ops.TextAnalysis.bigramLogProb(docs, "doc_id"))

    // ---- triangle stages ----
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"))
    def co = li.groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_suppkey")).as("sups"))
      .select(explode(col("sups")).as("u"), col("sups"))
      .select(col("u"), explode(col("sups")).as("v"))
      .where(col("u") < col("v"))
    def pre = co.select(least(col("u"), col("v")).cast("long").as("u"),
        greatest(col("u"), col("v")).cast("long").as("v"))
      .where(col("u") =!= col("v"))
    def sampled = pre.where(
      conv(substring(md5(concat(col("u").cast("string"), lit("_"),
        col("v").cast("string"))), 1, 8), 16, 10)
        .cast("long") % 10 === 0)
    t("tri_collectset_only")(li.groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_suppkey")).as("sups")))
    t("tri_pairs")(co)
    t("tri_sampled")(sampled)
    // sampler-cost isolation: the same 1/10 gate via codegen'd xxhash64
    // on the two longs instead of md5 over a concat string — measures
    // how much of the sample stage is string-alloc + md5
    t("tri_sampled_xxhash")(pre.where(
      pmod(xxhash64(col("u"), col("v")), lit(10)) === 0))
    t("tri_distinct")(sampled.distinct())
    t("tri_full")(graft.ops.Triangles.approxSparsified(co, "u", "v", pInv = 10))
    anatomy("tri_full")(
      graft.ops.Triangles.approxSparsified(co, "u", "v", pInv = 10))

    // ---- bigram variant A/B: scoring-side shapes over the same tfb ----
    if (args.length > 1 && args(1) == "bivar") {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DoubleType
      val minCount = 1L
      def scoreTail(px0: org.apache.spark.sql.DataFrame) = {
        val fxScale = 4294967296.0
        val scored = graft.functions.ExactMath.lnColumn(px0, "__p_x", "__lnp")
          .withColumn("__fx",
            floor(col("__lnp") * lit(fxScale)).cast("long") * col("tf"))
          .groupBy(col("doc_id"))
          .agg(sum(col("__fx")).as("__fxs"), sum(col("tf")).as("n_bigrams"))
          .select(col("doc_id"), col("n_bigrams"),
            (col("__fxs").cast(DoubleType) / lit(fxScale) / col("n_bigrams"))
              .as("avg_logprob"))
        docs.select(col("doc_id"))
          .join(scored, Seq("doc_id"), "left_outer")
          .select(col("doc_id"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            col("avg_logprob"))
      }
      def tfbC = tfb.localCheckpoint(false)
      def viaWindowModel(t: org.apache.spark.sql.DataFrame) = {
        val cab = t.groupBy(col("a"), col("b")).agg(sum(col("tf")).as("cnt_ab"))
        val model = cab.withColumn("cnt_a",
          sum(col("cnt_ab")).over(Window.partitionBy(col("a"))))
        val totals = cab.select(sum(col("cnt_ab")).as("n_total"))
        scoreTail(t.join(model, Seq("a", "b"), "left_outer")
          .crossJoin(broadcast(totals))
          .withColumn("__p_x",
            when(col("cnt_ab") >= minCount,
              col("cnt_ab").cast(DoubleType) / col("cnt_a").cast(DoubleType))
              .when(col("cnt_a") >= minCount,
                lit(0.5) / col("cnt_a").cast(DoubleType))
              .otherwise(lit(0.5) / col("n_total").cast(DoubleType))))
      }
      def viaTwoJoins(t: org.apache.spark.sql.DataFrame) = {
        val cab = t.groupBy(col("a"), col("b")).agg(sum(col("tf")).as("cnt_ab"))
        val ca = cab.groupBy(col("a")).agg(sum(col("cnt_ab")).as("cnt_a"))
          .where(col("cnt_a") >= minCount)
        val cb = cab.where(col("cnt_ab") >= minCount)
        val totals = cab.select(sum(col("cnt_ab")).as("n_total"))
        scoreTail(t.join(cb, Seq("a", "b"), "left_outer")
          .join(ca, Seq("a"), "left_outer")
          .crossJoin(broadcast(totals))
          .withColumn("__p_x",
            when(col("cnt_ab").isNotNull,
              col("cnt_ab").cast(DoubleType) / col("cnt_a").cast(DoubleType))
              .when(col("cnt_a").isNotNull,
                lit(0.5) / col("cnt_a").cast(DoubleType))
              .otherwise(lit(0.5) / col("n_total").cast(DoubleType))))
      }
      def biWindow = { // the r10 original extraction: posexplode + lead
        val tk = docs.repartition(par, col("doc_id"))
          .select(col("doc_id"),
            posexplode(tokens(lower(col("text")))).as(Seq("pos", "tok")))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        tk.select(col("doc_id"), col("tok").as("a"),
            lead(col("tok"), 1).over(w).as("b"))
          .where(col("b").isNotNull)
          .groupBy(col("doc_id"), col("a"), col("b"))
          .agg(count(lit(1)).as("tf"))
      }
      for (i <- 1 to 2) {
        t(s"bivar_zip_windowmodel_$i")(viaWindowModel(tfbC))
        t(s"bivar_zip_twojoins_$i")(viaTwoJoins(tfbC))
        t(s"bivar_lead_twojoins_$i")(viaTwoJoins(biWindow.localCheckpoint(false)))
      }
      spark.stop(); return
    }

    // ---- recert escalations (run with sfDir = /root/testdata/sf0.1) ----
    if (args.length > 1 && args(1) == "recert") {
      anatomy("para_full")(
        SparkEntry.queries("q_paragraph_dedup")(spark, sfDir))
      anatomy("bpe_encode_full")(
        SparkEntry.queries("q_bpe_encode")(spark, sfDir))
    }
    spark.stop()
  }
}
