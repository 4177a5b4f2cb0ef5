package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Decade study for the crawl-policy gate (r9): parseRobots + applyRobots
  * + directive/license signals over x1/x10/x100 synthetic crawls, with
  * the ROBOTS CORPUS GROWING with the page corpus (one robots.txt per ~25
  * pages — the realistic regime: a bigger crawl sees more hosts, so the
  * per-host rule table is corpus-derived and must NOT be force-broadcast,
  * same class as the r8 bigram model tables).
  *
  * What the study pins:
  *   - wall-time growth per decade for the full gate (parse windows +
  *     one rules join + the scalar signal chain) at `local[32]`;
  *   - the join strategy read from the POST-EXECUTION adaptive plan
  *     (AQE broadcasts the x1 rule table and is free to degrade to a
  *     shuffle as the host count grows — the documented fallback);
  *   - the keep fraction (untimed sanity: the fixture plants deny paths,
  *     noindex META, and license anchors at fixed rates, and the gate
  *     runs with `requireCommercial = true` so all three channels BIND —
  *     a drift in any channel's regexp or join moves the fraction).
  *
  * Fixtures are written to parquet first (the timed run measures a real
  * scan + codegen chain, not an in-memory range), deterministic from ids
  * — same protocol as the r8 paragraph/bigram studies.
  *
  * Output: one JSON line → SCALING_R9_POLICY.json, summarized in
  * SCALING.md.
  */
object PolicyScale {

  /** Synthetic crawl pages: host fan-out `id % nHosts`, 13 path classes
    * (4 of which the robots fixture denies), every 17th page a `.pdf`
    * (denied by the fixture's WILDCARD rule — r10: the anchored-regex
    * match path must carry its share of the decade cost), META robots on
    * 1/3 of pages, a license anchor on 1/2. */
  def pages(spark: SparkSession, n: Long, nHosts: Long): DataFrame = {
    val id = col("id")
    def istr(c: org.apache.spark.sql.Column) = c.cast(StringType)
    val host = concat(lit("h"), istr(id % nHosts), lit(".example.com"))
    val path = concat(lit("/sec"), istr(id % 13), lit("/doc"), istr(id),
      when(id % 17 === 0, lit(".pdf")).otherwise(lit("")))
    val meta = when(id % 3 === 0,
        lit("<meta name=\"robots\" content=\"noindex\">"))
      .when(id % 3 === 1, lit("<meta name=\"robots\" content=\"all\">"))
      .otherwise(lit(""))
    val anchor = when(id % 2 === 0, lit("<a rel=\"license\" " +
        "href=\"https://creativecommons.org/licenses/by/4.0/\">l</a>"))
      .otherwise(lit(""))
    spark.range(0, n, 1, 32).select(
      id.as("page_id"),
      concat(lit("https://"), host, path).as("url"),
      concat(lit("<html><head>"), meta,
        lit("</head><body><p>crawled page body text here</p>"), anchor,
        lit("</body></html>")).as("html"))
  }

  /** Per-host robots.txt bodies: a star group denying 4 of the 13 path
    * classes (which 4 varies by host) with an Allow carve-out AND one
    * `$`-anchored wildcard rule (r10: every page now pays one
    * regexp_like against the translated rule — the enforced-RFC-9309
    * cost must show in the decade numbers), plus a graftbot-specific
    * group on every 4th host (exercising the specific-shadows-star
    * resolution at scale). */
  def robots(spark: SparkSession, nHosts: Long): DataFrame = {
    val id = col("id")
    def istr(c: org.apache.spark.sql.Column) = c.cast(StringType)
    val k = id % 13
    val body = concat(
      lit("# generated\nUser-agent: *\nDisallow: /*.pdf$\nDisallow: /sec"),
      istr(k),
      lit("/\nAllow: /sec"), istr(k), lit("/ok/\nDisallow: /sec"),
      istr((k + 1) % 13), lit("/\nDisallow: /sec"), istr((k + 2) % 13),
      lit("/\nDisallow: /sec"), istr((k + 3) % 13), lit("/"),
      when(id % 4 === 0,
        concat(lit("\n\nUser-agent: graftbot\nDisallow: /sec"),
          istr((k + 5) % 13), lit("/"))).otherwise(lit("")))
    spark.range(0, nHosts, 1, 32).select(
      concat(lit("h"), istr(id), lit(".example.com")).as("host"),
      body.as("body"))
  }

  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0).toLong else 50000L
    val spark = StudySession.build()
    val scratch = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_policy_scale_${spark.sparkContext.applicationId}")
    scratch.mkdirs()

    def gateDf(mult: Long): DataFrame = {
      val dir = s"${scratch.getPath}/x$mult"
      val rules = graft.ops.Policy.parseRobots(
        spark.read.parquet(s"$dir/robots"), "host", "body",
        agent = "graftbot")
      // requireCommercial = true binds ALL THREE channels into
      // policy_keep — without it the license regexps would neither gate
      // rows nor survive column pruning into the timed plan, and the
      // keep-fraction sanity would only witness robots + META
      graft.ops.Policy.gate(spark.read.parquet(s"$dir/pages"),
        "url", "html", hostRules = Some(rules), requireCommercial = true)
        .where(col("policy_keep"))
        .select(col("page_id"))
    }

    val cells = Seq(1L, 10L, 100L).map { mult =>
      val n = base * mult
      val nHosts = math.max(1L, n / 25L)
      val dir = s"${scratch.getPath}/x$mult"
      pages(spark, n, nHosts).write.mode("overwrite")
        .parquet(s"$dir/pages")
      robots(spark, nHosts).write.mode("overwrite")
        .parquet(s"$dir/robots")
      gateDf(mult).write.format("noop").mode("overwrite").save() // warmup
      val sec = (1 to 2).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        gateDf(mult).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      // post-execution adaptive plan: what actually ran — the execution
      // doubles as the keep count (a separate .count() would re-run the
      // whole gate over the corpus a fourth time just to recount rows)
      val df = gateDf(mult)
      val kept = df.queryExecution.toRdd.count()
      val plan = df.queryExecution.executedPlan.toString
      val broadcastJoin = plan.contains("BroadcastHashJoin")
      val stageIds =
        "ShuffleQueryStage (\\d+)".r.findAllMatchIn(plan).map(_.group(1)).toSet
      val exchanges = if (stageIds.nonEmpty) stageIds.size
        else "Exchange (hash|range|SinglePartition)".r.findAllIn(plan).size
      (mult, n, nHosts, sec, broadcastJoin, exchanges,
        kept.toDouble / n.toDouble)
    }
    val rows = cells.map { case (m, n, h, s, b, e, f) =>
      s""""x$m":{"pages":$n,"hosts":$h,"sec":${f"$s%.3f"},""" +
        s""""rules_broadcast":$b,"exchanges":$e,"keep_frac":${f"$f%.4f"}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"policy_gate_decades","base":$base,"cells":$rows}""")
    // scratch cleanup (best effort — /tmp on the study box)
    def rm(f: java.io.File): Unit = {
      val c = f.listFiles(); if (c != null) c.foreach(rm); f.delete(): Unit
    }
    rm(scratch)
    spark.stop()
  }
}
