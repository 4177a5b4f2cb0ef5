package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-12 optimization probe: A/B alternative physical formulations of
  * the window-heavy text kernels (adjacent-pair assembly, fixed-merge BPE
  * replay, hashed-feature scoring) against the shipping forms, on the real
  * sf fixture with the bench's warmup + min-of-2 + noop-sink protocol.
  *
  * Each variant pair asserts RESULT EQUALITY first (sorted collect diff on
  * sf0.001-sized inputs; count + checksum at sf0.1) so a faster-but-wrong
  * candidate is rejected on the spot, then times both. Study-only — the
  * shipping operators change only after a variant wins here AND the oracle
  * sweep re-passes.
  */
object ProbeR12Opt {
  private def time2(spark: SparkSession)(mk: => DataFrame): Double = {
    mk.write.format("noop").mode("overwrite").save() // warmup
    (1 to 2).map { _ =>
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min
  }

  /** Order-insensitive content checksum over every cell (null-safe). */
  private def checksum(df: DataFrame): (Long, Long) = {
    val h = df.select(xxhash64(df.columns.map(col): _*).as("h"))
      .agg(sum(col("h")).as("s"), count(lit(1)).as("n")).collect()(0)
    (h.getLong(0), h.getLong(1))
  }

  // ---- variant kernels ----------------------------------------------

  /** Shipping bigram assembly: repartition + posexplode + lead window. */
  private def bigramsWindow(docs: DataFrame, idCol: String): DataFrame = {
    val par = graft.Conf.sizedShufflePartitions(docs, rowMultiplier = 2.0)
    val toks = docs.repartition(par, col(idCol))
      .select(col(idCol).as("doc_id"),
        posexplode(graft.ops.TextAnalysis.tokens(lower(col("text"))))
          .as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    toks
      .select(col("doc_id"), col("tok").as("a"),
        lead(col("tok"), 1).over(w).as("b"))
      .where(col("b").isNotNull)
      .groupBy(col("doc_id"), col("a"), col("b"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Candidate: stage the token array, zip it with its own tail — no
    * window, no sort, no per-token posexplode row stream. */
  private def bigramsZip(docs: DataFrame, idCol: String): DataFrame = {
    val par = graft.Conf.sizedShufflePartitions(docs, rowMultiplier = 2.0)
    val toked = docs.repartition(par, col(idCol))
      .select(col(idCol).as("doc_id"),
        graft.ops.TextAnalysis.tokens(lower(col("text"))).as("__t"))
    toked
      .where(size(col("__t")) >= 2)
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("__t"), lit(1), size(col("__t")) - 1),
          slice(col("__t"), lit(2), size(col("__t")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("pr"))
      .select(col("doc_id"), col("pr.a").as("a"), col("pr.b").as("b"))
      .groupBy(col("doc_id"), col("a"), col("b"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Greedy left-to-right non-overlapping single-pair merge as a per-row
    * fold. Equivalent to the window form's even-offset-in-run rule: after
    * a merge the accumulator tail is l+r, which can never re-match as the
    * left operand (|l+r| > |l|), so a run of consecutive matches merges
    * exactly its even offsets.
    */
  private def foldMerge(syms: Column, l: String, r: String): Column =
    when(size(syms) < 2, syms).otherwise(
      aggregate(
        slice(syms, lit(2), size(syms) - 1),
        array(element_at(syms, 1)),
        (acc, x) =>
          when(element_at(acc, -1) === lit(l) && x === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1),
              array(concat(element_at(acc, -1), x))))
            .otherwise(concat(acc, array(x)))))

  /** Shipping fixed-merge replay: one window pass per merge. */
  private def replayWindow(words: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    var w = words
    merges.foreach { case (l, r) => w = graft.ops.Bpe.applyMerge(w, l, r) }
    w.select(col("word"), col("wcount"),
      concat_ws("", col("syms")).as("segs"))
  }

  /** Candidate: one fold projection per merge — no windows at all. */
  private def replayFold(words: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val out = merges.foldLeft(words) { case (df, (l, r)) =>
      df.select(col("word"), col("wcount"),
        foldMerge(col("syms"), l, r).as("syms"))
    }
    out.select(col("word"), col("wcount"),
      concat_ws("", col("syms")).as("segs"))
  }

  /** Shipping pair-frequency snapshot: posexplode + lead window. */
  private def pairFreqWindow(words: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("word")).orderBy(col("pos"))
    words
      .select(col("word"), col("wcount"),
        posexplode(col("syms")).as(Seq("pos", "sym")))
      .withColumn("nxt", lead(col("sym"), 1).over(w))
      .where(col("nxt").isNotNull)
      .groupBy(col("sym").as("left"), col("nxt").as("right"))
      .agg(sum(col("wcount")).as("freq"))
  }

  /** Candidate: zip the symbol array with its own tail. */
  private def pairFreqZip(words: DataFrame): DataFrame =
    words
      .where(size(col("syms")) >= 2)
      .select(col("wcount"),
        explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("pr"))
      .groupBy(col("pr.l").as("left"), col("pr.r").as("right"))
      .agg(sum(col("wcount")).as("freq"))

  private def weightOf(feature: Column, buckets: Int): Column =
    pmod(pmod(xxhash64(feature), lit(buckets.toLong)) * lit(2654435761L)
      + lit(1013904223L), lit(2001L)) - lit(1000L)

  /** Shipping classifier scoring: explode + lead window + regroup. */
  private def scoreWindow(docs: DataFrame, buckets: Int): DataFrame = {
    val par = graft.Conf.sizedShufflePartitions(docs, rowMultiplier = 2.0)
    val toks = docs.repartition(par, col("doc_id"))
      .select(col("doc_id"),
        posexplode(graft.ops.TextAnalysis.tokens(lower(col("text"))))
          .as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    toks
      .select(col("doc_id"), col("tok"), lead(col("tok"), 1).over(w).as("__nxt"))
      .select(col("doc_id"),
        (weightOf(col("tok"), buckets) + when(col("__nxt").isNotNull,
          weightOf(concat_ws(" ", col("tok"), col("__nxt")), buckets))
          .otherwise(lit(0L))).as("__w"),
        when(col("__nxt").isNotNull, lit(2L)).otherwise(lit(1L)).as("__nf"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__w")).as("__sw"), sum(col("__nf")).as("n_features"))
  }

  /** Candidate: per-row fold over the staged token array — no explode, no
    * window, no regroup shuffle. */
  private def scoreFold(docs: DataFrame, buckets: Int): DataFrame = {
    val par = graft.Conf.sizedShufflePartitions(docs, rowMultiplier = 2.0)
    val toked = docs.repartition(par, col("doc_id"))
      .select(col("doc_id"),
        graft.ops.TextAnalysis.tokens(lower(col("text"))).as("__t"))
    val t = col("__t")
    val uni = aggregate(t, lit(0L), (acc, x) => acc + weightOf(x, buckets))
    val bi = when(size(t) >= 2,
      aggregate(
        zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
          (a, b) => concat_ws(" ", a, b)),
        lit(0L), (acc, x) => acc + weightOf(x, buckets)))
      .otherwise(lit(0L))
    toked
      .where(size(t) >= 1)
      .select(col("doc_id"), (uni + bi).as("__sw"),
        (size(t) * 2 - 1).cast(LongType).as("n_features"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").toSet)
    def want(k: String) = only.forall(_.contains(k))

    def ab(name: String)(mkA: => DataFrame, mkB: => DataFrame): Unit = {
      val (ha, hb) = (checksum(mkA), checksum(mkB))
      val eq = ha == hb
      val ta = time2(spark)(mkA)
      val tb = time2(spark)(mkB)
      println(f"""{"probe":"$name","equal":$eq,"a_rows":${ha._2},"b_rows":${hb._2},"a_sec":$ta%.3f,"b_sec":$tb%.3f}""")
    }

    if (want("bigram")) ab("bigram_pairs")(
      bigramsWindow(docs, "doc_id"), bigramsZip(docs, "doc_id"))

    val encodeMerges = SparkEntry.encodeMergesForProbe
    lazy val words = graft.ops.Bpe.wordTable(docs, "text")
    if (want("replay")) ab("bpe_replay")(
      replayWindow(words, encodeMerges), replayFold(words, encodeMerges))
    if (want("pairfreq")) ab("bpe_pairfreq")(
      pairFreqWindow(words), pairFreqZip(words))
    if (want("score")) ab("classifier_score")(
      scoreWindow(docs, 1024), scoreFold(docs, 1024))

    // matchCount formulations: the shipping size(regexp_extract_all)
    // materializes every match as an array element just to count it;
    // regexp_count is the same regex engine + same non-overlapping scan
    // with no allocation. Third variant de-regexes the gopher symbol
    // rule outright: '#' and '...' match independently (neither consumes
    // the other's characters), so count = char-count(#) + nonoverlap
    // replace-count(...).
    if (want("gopher")) {
      val gtext = SparkEntry.gopherFixtureTextForProbe
      val pats = graft.ops.TextAnalysis.webRedactionRules.map(_._1)
      def counts(f: (Column, String) => Column): DataFrame =
        docs.select(col("doc_id") +:
          pats.zipWithIndex.map { case (p, i) => f(col("text"), p).as(s"n$i") }: _*)
      def extractAll(c: Column, p: String): Column =
        size(regexp_extract_all(c, lit(p), lit(0))).cast(LongType)
      def reCount(c: Column, p: String): Column =
        regexp_count(c, lit(p)).cast(LongType)
      ab("pii_matchcount")(counts(extractAll), counts(reCount))
      val gdocs = docs.select(col("doc_id"), gtext.as("g"))
      ab("gopher_symbolhits")(
        gdocs.select(col("doc_id"), reCount(col("g"), "#|\\.\\.\\.").as("n")),
        gdocs.select(col("doc_id"),
          ((length(col("g")) - length(regexp_replace(col("g"), lit("#"), lit("")))) +
            (length(col("g")) - length(replace(col("g"), lit("..."), lit("")))) / 3)
            .cast(LongType).as("n")))
      // where does q_gopher_rules actually spend: full kernel vs the
      // split/transform staging alone vs staging + per-element rlikes
      def t(name: String)(mk: => DataFrame): Unit =
        println(f"""{"probe":"gopher_$name","sec":${time2(spark)(mk)}%.3f}""")
      t("full") {
        graft.ops.TextAnalysis.gopherRules(gdocs, "g")
          .select(col("doc_id"), col("n_words"), col("gopher_keep"))
      }
      t("stage_split") {
        gdocs.select(col("doc_id"),
          size(filter(split(col("g"), "\\s+"), t => t =!= "")).as("nw"),
          size(split(col("g"), "\n")).as("nl"))
      }
      t("stage_rlikes") {
        val words = filter(split(col("g"), "\\s+"), t => t =!= "")
        val lines = split(col("g"), "\n")
        gdocs.select(col("doc_id"),
          size(filter(words, t => t.rlike("[A-Za-z]"))).as("aw"),
          size(filter(lines, l => l.rlike("^\\s*[-*•] "))).as("bl"),
          size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$"))).as("el"))
      }
    }

    // stage anatomy for the jaccard-dedup family: pair generation vs CC
    // vs canonical-keep (each stage includes its upstream — deltas are
    // the stage costs)
    if (want("dedup")) {
      import graft.ops.Dedup
      def t(name: String)(mk: => DataFrame): Unit =
        println(f"""{"probe":"dedup_$name","sec":${time2(spark)(mk)}%.3f}""")
      t("pairs") {
        Dedup.jaccardPairs(docs, "doc_id", "text",
          n = 3, minJaccard = 0.5, maxDocFreq = 20L)
      }
      t("pairs_cc") {
        Dedup.connectedComponents(
          Dedup.jaccardPairs(docs, "doc_id", "text",
            n = 3, minJaccard = 0.5, maxDocFreq = 20L), "id_a", "id_b")
      }
      t("canonical") {
        Dedup.keepCanonical(docs, "doc_id",
          Dedup.jaccardPairs(docs, "doc_id", "text",
            n = 3, minJaccard = 0.5, maxDocFreq = 20L),
          "id_a", "id_b", Seq(col("n_chars").desc, col("doc_id")))
          .select(col("doc_id"), col("source"), col("n_chars"))
      }
    }

    // Shared-subtree materialization A/Bs (guide §2.4 / §5 "caching"):
    // bm25Search and unigramLogProb derive model tables (df, dl, counts,
    // totals) from one corpus-wide tf aggregation that MULTIPLE plan legs
    // consume — Spark plans no cross-consumer subplan sharing, so unless
    // AQE's runtime stage reuse dedupes the identical exchange subtrees,
    // the corpus tokenize+explode+agg executes once per leg. The B
    // variants cut lineage on the shared tf (the bigramLogProb pattern,
    // Checkpoints.CutOps) so it computes exactly once. Same expressions,
    // same values — checksum-equality asserted before timing.
    if (want("share")) {
      import graft.ops.Checkpoints.CutOps
      import graft.ops.TextAnalysis
      import graft.functions.ExactMath

      def bm25Variant(cut: Boolean): DataFrame = {
        val terms = Seq("spark", "join", "window")
        val (k1, b, topK) = (1.2, 0.75, 20)
        val t = terms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
        val tf0 = docs.select(col("doc_id"),
            explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
          .groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("tf"))
        val tf = if (cut) tf0.cutLineage(false) else tf0
        val dl0 = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
        val dl = if (cut) dl0.cutLineage(false) else dl0
        val n = docs.select(count(lit(1)).as("n_docs"))
        val avgdl = dl.select(
          (sum(col("dl")).cast(DoubleType) / count(lit(1))).as("avgdl"))
        val dfT = tf.where(col("token").isin(t: _*))
          .groupBy(col("token")).agg(count(lit(1)).as("df"))
        val matched = tf.where(col("token").isin(t: _*))
          .join(broadcast(dfT), Seq("token"))
          .join(dl, Seq("doc_id"))
          .crossJoin(broadcast(n))
          .crossJoin(broadcast(avgdl))
        val idfInput =
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)
        val withIdf = ExactMath.lnColumn(
          matched.withColumn("__idf_x", idfInput), "__idf_x", "__idf")
        val tfNorm = col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
        val fxScale = 1099511627776.0
        withIdf
          .withColumn("term_score", col("__idf") * tfNorm)
          .withColumn("__ts_fx", floor(col("term_score") * lit(fxScale)))
          .groupBy(col("doc_id"))
          .agg((sum(col("__ts_fx")) / lit(fxScale)).as("score"),
            count(lit(1)).as("n_matched"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(topK)
      }

      def unigramVariant(cut: Boolean): DataFrame = {
        val minCount = 3L
        val tf0 = docs
          .select(col("doc_id"),
            explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
          .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
        val tf = if (cut) tf0.cutLineage(false) else tf0
        val counts0 = tf.groupBy(col("token")).agg(sum(col("tf")).as("cnt"))
        val counts = if (cut) counts0.cutLineage(false) else counts0
        val totals = counts.select(sum(col("cnt")).as("n_total"))
        val lm = counts.where(col("cnt") >= minCount)
        val px = tf.join(lm, Seq("token"), "left_outer")
          .crossJoin(broadcast(totals))
          .withColumn("__p_x",
            when(col("cnt").isNotNull,
              col("cnt").cast(DoubleType) / col("n_total").cast(DoubleType))
              .otherwise(lit(0.5) / col("n_total").cast(DoubleType)))
        val fxScale = 4294967296.0
        val scored = ExactMath.lnColumn(px, "__p_x", "__lnp")
          .withColumn("__fx",
            floor(col("__lnp") * lit(fxScale)).cast(LongType) * col("tf"))
          .groupBy(col("doc_id"))
          .agg(sum(col("__fx")).as("__fxs"), sum(col("tf")).as("n_tokens"))
          .select(col("doc_id"), col("n_tokens"),
            (col("__fxs").cast(DoubleType) / lit(fxScale) / col("n_tokens"))
              .as("avg_logprob"))
        docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left_outer")
          .select(col("doc_id"),
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"), col("avg_logprob"))
      }

      // decontaminate with the EVAL-side shingle pipeline (consumed by
      // both the df-cap aggregation and the semi-join back) materialized
      // once; the corpus side is single-consumer and stays lazy.
      def decontVariant(cut: Boolean): DataFrame = {
        val n = 5
        val (minShared, maxEvalDf) = (3L, 10L)
        def shingles(d: DataFrame): DataFrame = {
          val par = graft.Conf.sizedShufflePartitions(d, rowMultiplier = n.toDouble)
          val toks = d.repartition(par, col("doc_id"))
            .select(col("doc_id"),
              posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
          val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          val leadCols = (1 until n).map(i => lead(col("tok"), i).over(w).as(s"__t$i"))
          toks
            .select((Seq(col("doc_id"), col("pos"), col("tok")) ++ leadCols): _*)
            .where(col(s"__t${n - 1}").isNotNull)
            .select(col("doc_id"),
              concat_ws(" ", (col("tok") +: (1 until n).map(i => col(s"__t$i"))): _*)
                .as("shingle"))
            .dropDuplicates("doc_id", "shingle")
        }
        val corpusSh = shingles(docs.where(col("doc_id") % 20 =!= 0))
        val evalSh0 = shingles(docs.where(col("doc_id") % 20 === 0))
          .withColumnRenamed("doc_id", "eval_id")
        val evalSh = if (cut) evalSh0.cutLineage(false) else evalSh0
        val rareEval = evalSh.groupBy("shingle").agg(count(lit(1)).as("df"))
          .where(col("df") <= maxEvalDf).select("shingle")
        val evalIdx = evalSh.join(rareEval, Seq("shingle"), "left_semi")
        corpusSh
          .join(broadcast(evalIdx), Seq("shingle"))
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("shingle")).as("n_shared_shingles"),
            countDistinct(col("eval_id")).as("n_eval_docs"))
          .where(col("n_shared_shingles") >= minShared)
      }

      ab("bm25_share")(bm25Variant(cut = false), bm25Variant(cut = true))
      ab("unigram_share")(unigramVariant(cut = false), unigramVariant(cut = true))
      ab("decont_share")(decontVariant(cut = false), decontVariant(cut = true))
    }

    // tokenizer formulation: the shipping regexp_extract_all(text, \w+)
    // walks matches and extracts group 0 per match; splitting on the
    // complement (\W+) plus a codegen'd array_remove of the boundary
    // empties produces the IDENTICAL token array (maximal \w-runs) from
    // the same regex engine — candidate in case the split path's simpler
    // per-match bookkeeping is cheaper. tokens() underpins ~30 queries,
    // so even a small per-MB delta matters.
    if (want("tokens")) {
      import graft.ops.TextAnalysis
      def viaExtract(c: Column): Column = TextAnalysis.tokens(c)
      def viaSplit(c: Column): Column = array_remove(split(c, "\\W+"), "")
      ab("tokens_project")(
        docs.select(col("doc_id"), viaExtract(lower(col("text"))).as("t")),
        docs.select(col("doc_id"), viaSplit(lower(col("text"))).as("t")))
      // a representative consumer: token count + distinct count (forces
      // full array production but no shuffle of the arrays)
      ab("tokens_stats")(
        docs.select(col("doc_id"),
          size(viaExtract(lower(col("text")))).as("n"),
          size(array_distinct(viaExtract(lower(col("text"))))).as("nd")),
        docs.select(col("doc_id"),
          size(viaSplit(lower(col("text")))).as("n"),
          size(array_distinct(viaSplit(lower(col("text"))))).as("nd")))
    }

    // langId double-evaluation: the shipping when(best.score>0, best.lang)
    // inlines `best` = array_max over 5 per-profile filter() scans TWICE,
    // and codegen subexpression elimination cannot unify the copies (each
    // instantiation mints fresh lambda exprIds — plan dump shows both
    // CASE branches carrying the full 5-filter argmax). Candidate: bind
    // `best` exactly once as the input of a 1-element transform() and do
    // the score>0/und fallback inside the lambda — the filters are
    // interpreted HOFs either way, so this halves the classify work.
    if (want("langid")) {
      import graft.ops.TextAnalysis
      def langIdOnce(toks: Column): Column = {
        val n = nullif(size(toks), lit(0)).cast(DoubleType)
        val scored = TextAnalysis.langProfiles.toSeq.sortBy(_._1).map {
          case (lang, words) =>
            val sw = typedLit(words)
            struct(
              (size(filter(toks, t => array_contains(sw, t)))
                .cast(DoubleType) / n).as("score"),
              lit(lang).as("lang"))
        }
        element_at(transform(array(array_max(array(scored: _*))), b =>
          when(b.getField("score") > 0.0, b.getField("lang"))
            .otherwise(lit("und"))), 1)
      }
      def mixture(once: Boolean): DataFrame = {
        val w = 20
        val chunks = docs
          .select(col("doc_id"), TextAnalysis.tokens(lower(col("text"))).as("t"))
          .select(col("doc_id"),
            explode(transform(
              sequence(lit(0), ((size(col("t")) - lit(1)) / lit(w)).cast(IntegerType)),
              i => slice(col("t"), i * lit(w) + lit(1), lit(w)))).as("c"))
          .where(size(col("c")) > 0)
        chunks
          .select(col("doc_id"),
            (if (once) langIdOnce(col("c"))
             else TextAnalysis.langIdFromTokens(col("c"))).as("lang"))
          .groupBy(col("doc_id"), col("lang"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("doc_id"))
          .agg(sum(col("cnt")).as("n_chunks"),
            countDistinct(col("lang")).as("n_langs"),
            max(struct(col("cnt"), col("lang"))).as("__m"))
          .select(col("doc_id"), col("n_chunks"), col("n_langs"),
            col("__m").getField("lang").as("majority_lang"),
            floor(lit(10000L) * (col("n_chunks") - col("__m").getField("cnt"))
              / col("n_chunks")).cast(LongType).as("minority_pm"))
      }
      ab("langid_mixture")(mixture(once = false), mixture(once = true))
      ab("langid_perdoc")(
        docs.select(col("doc_id"),
          TextAnalysis.langId(col("text")).as("lang")),
        docs.select(col("doc_id"),
          langIdOnce(TextAnalysis.tokens(lower(col("text")))).as("lang")))
    }

    // stage anatomy for q_image_neardup: where do the ~3 s go?
    if (want("image")) {
      import graft.ops.{Dedup, Multimodal}
      def t(name: String)(mk: => DataFrame): Unit =
        println(f"""{"probe":"image_$name","sec":${time2(spark)(mk)}%.3f}""")
      t("encode") {
        Multimodal.encodePngFixture(docs, twinEvery = 97)
          .select(col("media_id"), length(col("bytes")).as("n"))
      }
      t("encode_phash") {
        Multimodal.imagePHash(
          Multimodal.encodePngFixture(docs, twinEvery = 97)).toDF()
      }
      t("full") {
        Dedup.hammingNearDupPairs(
          Multimodal.imagePHash(
            Multimodal.encodePngFixture(docs, twinEvery = 97)).toDF(),
          "media_id", "phash")
      }
    }
    spark.stop()
  }
}
