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
