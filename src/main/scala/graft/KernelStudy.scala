package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-GB throughput of the zero-exchange scalar kernels (r9 verdict
  * item #2): the HTML extraction / policy-signal / text-gate chains are
  * pure codegen'd regexp work — no shuffle to bottleneck at scale — so at
  * 100 TB their cost IS per-row CPU, and "runs inside the scan pass"
  * needs a bytes/second number, not an exchange count. This study
  * measures each kernel over synthetic pages of realistic sizes
  * (10–100 KB), tag-dense worst cases, and two ADVERSARIAL shapes aimed
  * at the non-greedy block-drop regexes (`(?is)<tag[^>]*>.*?</tag>`):
  *
  *  - `patho_no_close`: thousands of `<script>` opens, NO close — every
  *    open's `.*?` probe scans to end-of-page and fails: the known
  *    O(opens · size) java.util.regex worst case.
  *  - `patho_one_close`: one EARLY close, then the open flood — the
  *    first block matches short, every later open still scans to the
  *    end. (The benign-looking case — one close at the END — is LINEAR:
  *    the first open's match swallows every inner open in one pass.)
  *
  * Protocol: per (kernel, shape, size) the page frame is built from a
  * driver-side template + a row-id splice (not constant-foldable), timed
  * as warmup + min-of-3 noop writes; a `length(page)` baseline on the
  * same frame isolates page construction + scan floor, and throughput =
  * bytes / (kernel − baseline). x1/x10 decade rows on the prose shapes
  * assert the MB/s is size-constant (bandwidth), not corpus-dependent.
  *
  * Output: one JSON line (captured to SCALING_R10_KERNELS.json,
  * summarized in SCALING.md §kernels).
  */
object KernelStudy {

  private def buildPage(shape: String, targetBytes: Int): (String, String) = {
    val sb = new StringBuilder
    shape match {
      case "html_prose" =>
        val head = "<html><head><title>Doc " // id spliced after this
        sb.append("</title><meta name=\"robots\" content=\"index, follow\">")
          .append("<style>body { margin: 0 }</style>")
          .append("<script>var t = 1 < 2;</script></head><body>")
          .append("<header><h1>Site Masthead</h1></header>")
          .append("<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>")
          .append("<div id=\"main\">")
        var i = 0
        while (sb.length < targetBytes - 220) {
          sb.append("<p>The quick measurement paragraph number ").append(i)
            .append(" contains plain readable prose &amp; several dozen ")
            .append("ordinary words that a real article body would carry, ")
            .append("with an occasional <b>inline</b> emphasis tag.</p>")
          i += 1
        }
        sb.append("</div><aside>Related &amp; sponsored</aside>")
          .append("<footer>&copy; 2024 ")
          .append("<a rel=\"license\" href=\"https://creativecommons.org/")
          .append("licenses/by/4.0/\">CC BY</a></footer></body></html>")
        (head, sb.toString)
      case "html_tagdense" =>
        val head = "<html><head><title>T"
        sb.append("</title></head><body><div id=\"main\">")
        var i = 0
        while (sb.length < targetBytes - 60) {
          sb.append("<div class=\"c\"><span>w").append(i)
            .append("</span> <a href=\"/l\">lnk</a> <em>x</em><i>y</i></div>")
          i += 1
        }
        sb.append("</div></body></html>")
        (head, sb.toString)
      case "patho_no_close" =>
        val head = "<html><body><p>id "
        sb.append("</p>")
        while (sb.length < targetBytes - 30)
          sb.append("<script type=\"a\">var q=1;")
        sb.append("</body></html>") // NO </script> anywhere
        (head, sb.toString)
      case "patho_one_close" =>
        val head = "<html><body><p>id "
        sb.append("</p><script>x</script>") // one EARLY close
        while (sb.length < targetBytes - 30)
          sb.append("<script type=\"a\">var q=1;")
        sb.append("</body></html>")
        (head, sb.toString)
      case "patho_anchor_flood" =>
        // thousands of <a> opens, one early close, none after — the
        // anchor-extraction worst case that the script floods cannot
        // reach (stripNonContent removes script blocks before the
        // anchor scan runs)
        val head = "<html><body><p>id "
        sb.append("</p><a href=\"/x\">t</a>")
        while (sb.length < targetBytes - 30)
          sb.append("<a href=\"/some/path\">w ")
        sb.append("</body></html>")
        (head, sb.toString)
      case "text_prose" =>
        val head = "Document " // id spliced after this
        var i = 0
        while (sb.length < targetBytes - 40) {
          sb.append(" begins sentence ").append(i)
            .append(" with the plain words that have to be carried and ")
            .append("measured across a line of text ending cleanly.")
          if (i % 4 == 3) sb.append('\n')
          if (i % 11 == 0) sb.append(" reach user").append(i % 50)
            .append("@mail.example.com or call 555-234-5678 now.")
          i += 1
        }
        (head, sb.toString)
      case other => sys.error(s"unknown shape $other")
    }
  }

  /** (kernel name, input shape family, projection builder). */
  private def kernels: Seq[(String, String, Column => Column)] = Seq(
    ("html_to_text", "html", h => graft.ops.Html.htmlToText(h)),
    ("main_content", "html", h => graft.ops.Html.mainContent(h)),
    ("link_density", "html", h => graft.ops.Html.linkDensityPermyriad(h)),
    ("policy_signals", "html", h =>
      struct(graft.ops.Policy.licenseUrl(h),
        graft.ops.Policy.metaRobotsContent(h))),
    ("pii_redact", "text", t =>
      graft.ops.TextAnalysis.redact(t,
        graft.ops.TextAnalysis.webRedactionRules)))

  /** DataFrame-level text gates measured through their own operator. */
  private def dfKernels: Seq[(String, DataFrame => DataFrame)] = Seq(
    ("gopher_rules",
      df => graft.ops.TextAnalysis.gopherRules(df, "page")),
    ("c4_line_filter",
      df => graft.ops.TextAnalysis.c4LineFilter(df, "page")))

  def main(args: Array[String]): Unit = {
    val targetMb = if (args.nonEmpty) args(0).toInt
      else sys.env.getOrElse("SPARK_GRAFT_KERNEL_MB", "256").toInt
    val spark = StudySession.build()

    def pageFrame(shape: String, pageBytes: Int, totalMb: Int): DataFrame = {
      val (head, body) = buildPage(shape, pageBytes)
      val n = math.max(1L, (totalMb.toLong << 20) / body.length)
      spark.range(n).select(
        concat(lit(head), col("id").cast("string"), lit(body)).as("page"))
    }
    def timeNoop(df: => DataFrame): Double = {
      df.write.format("noop").mode("overwrite").save()
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    // (shape, page KB, total MB) grid: prose sizes bracket real pages and
    // carry the x10 decade; tag-dense and the two adversarial shapes are
    // worst-case probes at the SAME budget as prose — with the linear
    // dropBlock they must hold prose-order throughput (under the
    // pre-fix regexp_replace form they collapsed ~25×, which is why the
    // original run capped them at budget/8)
    val htmlConfigs = Seq(
      ("html_prose", 10, targetMb), ("html_prose", 100, targetMb),
      ("html_prose", 30, targetMb * 10),
      ("html_tagdense", 30, targetMb),
      ("patho_no_close", 30, targetMb),
      ("patho_one_close", 30, targetMb),
      ("patho_anchor_flood", 30, targetMb))
    val textConfigs = Seq(
      ("text_prose", 10, targetMb), ("text_prose", 100, targetMb),
      ("text_prose", 30, targetMb * 10))

    val rows = scala.collection.mutable.ListBuffer.empty[String]
    def measure(kernel: String, shape: String, pageKb: Int, totalMb: Int,
        run: DataFrame => DataFrame): Unit = {
      val df = pageFrame(shape, pageKb * 1024, totalMb)
      val base = timeNoop(df.select(length(col("page")).as("n")))
      val sec = timeNoop(run(df))
      // ACTUAL bytes (sum of row lengths), not nominal page size — the
      // templates land a few % under target and carry a head+id splice
      val bytes = df.select(sum(length(col("page"))))
        .head().getLong(0)
      val mb = bytes.toDouble / (1 << 20)
      // a kernel measuring at/under its baseline is a FLAGGED cell
      // (mbps -1), never a fabricated huge number
      val net = sec - base
      val mbps = if (net > 5e-3) mb / net else -1.0
      rows += s"""{"kernel":"$kernel","shape":"$shape","page_kb":$pageKb,""" +
        s""""mb":${f"$mb%.1f"},"sec":${f"$sec%.3f"},"base_sec":${
          f"$base%.3f"},"mbps":${f"$mbps%.1f"}}"""
      println(s"  $kernel/$shape/${pageKb}KB/${totalMb}MB: " +
        f"$sec%.3f s (base $base%.3f) -> $mbps%.1f MB/s")
    }

    for ((name, fam, proj) <- kernels; (shape, kb, mb) <- (
        if (fam == "html") htmlConfigs else textConfigs))
      measure(name, shape, kb, mb, df => df.select(proj(col("page")).as("o")))
    for ((name, op) <- dfKernels; (shape, kb, mb) <- textConfigs)
      measure(name, shape, kb, mb, op)

    println(s"""{"metric":"kernel_throughput","target_mb":$targetMb,""" +
      s""""cpus":"${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}","rows":[${
        rows.mkString(",")}]}""")
    spark.stop()
  }
}
