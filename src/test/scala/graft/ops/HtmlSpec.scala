package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Html — rule-level extraction cases the round-trip oracle can't
  * isolate (boilerplate-block removal, entity decode order, the density
  * gate), plus the compositions the operator exists for: a WARC payload
  * bridge and the HTML front end of Curate.run.
  */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String, minWords: Int = 3): String =
    Seq(html).toDF("h").select(Html.mainContent(col("h"), minWords))
      .head.getString(0)

  private def toText(html: String): String =
    Seq(html).toDF("h").select(Html.htmlToText(col("h"))).head.getString(0)

  private val page =
    """<html><head><title>Doc Title Leaks If Head Survives</title>
      |<style> body { color: red; } .x > .y { margin: 0 } </style>
      |</head><body>
      |<script type="text/javascript"> var x = 1 < 2; alert("script leak"); </script>
      |<!-- comment with <p>fake paragraph</p> inside -->
      |<header><h1>Site Masthead</h1></header>
      |<nav><ul><li><a href="/">Home</a></li><li><a href="/a">About</a></li></ul></nav>
      |<div id="main">
      |<p>The first real paragraph of body prose.</p>
      |<p>A second paragraph with <b>inline</b> <a href="/x">markup</a> kept intact.</p>
      |<p>OK</p>
      |</div>
      |<aside>Related sponsored links</aside>
      |<footer>Copyright footer text</footer>
      |</body></html>""".stripMargin

  test("fixture page: boilerplate gone, prose kept, short block gated") {
    val out = extract(page)
    assert(out ===
      "The first real paragraph of body prose.\n\n" +
        "A second paragraph with inline markup kept intact.")
    // every boilerplate channel is exercised and none leaks
    for (leak <- Seq("Title", "color", "script leak", "fake paragraph",
        "Masthead", "Home", "About", "sponsored", "Copyright"))
      assert(!out.contains(leak), s"boilerplate leaked: $leak")
    // the 1-word block "OK" fails the 3-word density gate…
    assert(!out.contains("OK"))
    // …but survives with the gate lowered
    assert(extract(page, minWords = 1).contains("OK"))
  }

  test("inline tags join without separators; block tags separate") {
    assert(toText("<p>a<b>b</b>c</p><p>next</p>") === "abc\n\nnext")
    assert(toText("one<br>two") === "one\ntwo")
    assert(toText("<ul><li>x y z</li><li>p q r</li></ul>") === "x y z\n\np q r")
  }

  test("entity decode: fixed set, &amp; decoded last") {
    assert(toText("<p>a &lt;tag&gt; &quot;q&quot; it&#39;s A&nbsp;B</p>") ===
      "a <tag> \"q\" it's A B")
    // &amp;lt; is the ESCAPED TEXT "&lt;" — must not double-decode to "<"
    assert(toText("<p>literal &amp;lt; stays</p>") === "literal &lt; stays")
    assert(toText("<p>Q&amp;A</p>") === "Q&A")
  }

  test("<header> removal does not swallow <head>-prefixed words or tags") {
    // \b after the tag name: "header" must not match the "head" rule and
    // a word like "heading" in text is untouched
    assert(toText("<body><p>heading text</p><header>gone</header></body>") ===
      "heading text")
  }

  test("null in, null out; empty page yields empty string") {
    val r = Seq[(Int, String)]((1, null)).toDF("i", "h")
      .select(Html.mainContent(col("h"))).head
    assert(r.isNullAt(0))
    assert(extract("<html><body></body></html>") === "")
  }

  test("linear dropBlock ≡ non-greedy regex semantics on adversarial shapes") {
    // the linear split-based block removal must reproduce the
    // first-close-pairing regex on every shape, including the
    // open-flood pages the regex form goes superlinear on
    val cases = Seq(
      "a<script>x</script>b",                        // plain block
      "a<script>x</script>b<script>y</script>c",     // two blocks
      "a<script>b<script>c</script>d</script>e",     // nested same-tag
      "a<script>b",                                  // unclosed open
      "a</script>b",                                 // orphan close
      "a<script>x</SCRIPT >b",                       // case + spaced close
      "a<script>b<script>c<script>d</script>e",      // open flood, one close
      "x</script></script>y<script>z",               // double orphan + tail open
      "",                                            // empty
      "<script src=\"u\">only block</script>",       // block is whole page
      // close-tag TEXT inside a quoted attribute: the regex form's open
      // consumes through the embedded close's '>' and the block runs to
      // the NEXT real close — the pre-normalization must reproduce that
      "pre<script data-x=\"</script>\">payload</script>post",
      // same shape with NO second close: the regex never matches and the
      // tag-strip rule eats the malformed open either way
      "pre<script data-x=\"</script>\">payload",
      // chained attr-embedded closes
      "a<script x=\"</script>b=\"</script>x</script>done",
      // attr contains ANOTHER tag before the real '>': the full-open
      // branch must still align with the regex's first-'>' semantics
      "p<script a=\"<x></script>y</script>q")
    val df = cases.toDF("h")
    val out = df.select(
        Html.htmlToText(col("h")).as("fast"),
        // the ORIGINAL regex chain, inlined: same downstream rules, block
        // removal via the non-greedy form
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          col("h"),
          "(?is)<script\\b[^>]*>.*?</script\\s*>", ""),
          "(?s)<[^>]*>", ""),
          "[ \t]+", " "),
          "^\\s+|\\s+$", "").as("ref"))
      .as[(String, String)].collect()
    cases.zip(out).foreach { case (in, (fast, ref)) =>
      assert(fast === ref, s"divergence on ${in.take(60)}")
    }
  }

  test("dropBlock documented divergence: nested MALFORMED open inside a closed block") {
    // The pre-normalization rewrites attr-embedded closes globally — even
    // on text that is block CONTENT under regex semantics. For an
    // unclosed malformed open nested inside a closed block, the rewrite
    // consumes the close that terminated the outer block, so the linear
    // form drops MORE than the regex form (extra content dropped on
    // malformed pages — the conservative direction for a quality filter,
    // never a leak). This pins the scaladoc's documented divergence: the
    // regex form would yield "yz" here.
    val in = "<script>x<script a</script>y</script>z"
    assert(toText(in) === "z")
    // the regex reference, for the record (computed the same way as the
    // equivalence test's ref column):
    val ref = Seq(in).toDF("h").select(
      regexp_replace(regexp_replace(col("h"),
        "(?is)<script\\b[^>]*>.*?</script\\s*>", ""),
        "(?s)<[^>]*>", "")).head.getString(0)
    assert(ref === "yz") // the two forms diverge HERE by design
  }

  test("linkDensityPermyriad: link farm scores high, prose scores low") {
    val farm = "<body><p><a href='/1'>one link</a> <a href='/2'>two link</a></p></body>"
    val prose = "<body><p>plain prose with a single <a href='/x'>tiny</a> link " +
      "inside a much longer paragraph of ordinary text</p></body>"
    val d = Seq((1, farm), (2, prose)).toDF("id", "h")
      .select(col("id"), Html.linkDensityPermyriad(col("h")).as("ld"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(d(1) > 9000L, s"link farm density ${d(1)}")
    assert(d(2) < 2000L, s"prose density ${d(2)}")
    // no visible text → null, not division blowup
    val n = Seq("<body><script>x</script></body>").toDF("h")
      .select(Html.linkDensityPermyriad(col("h"))).head
    assert(n.isNullAt(0))
  }

  test("WARC bridge: payload → mainContent equals direct extraction") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val rendered = docs.select(col("doc_id"), concat(
      lit("<html><head><title>t</title></head><body><nav>Home</nav><p>"),
      col("text"), lit("</p><footer>f</footer></body></html>")).as("text"),
      col("source"))
    val dir = java.nio.file.Files.createTempDirectory("graft_html_warc").toFile
    dir.deleteOnExit()
    graft.sources.WarcSource.write(rendered, "doc_id", "text", "source", dir.getPath)
    val viaWarc = graft.sources.WarcSource.read(spark, dir.getPath)
      .select(Html.mainContent(col("payload")).as("t"))
    val direct = rendered.select(Html.mainContent(col("text")).as("t"))
    assert(viaWarc.except(direct).isEmpty && direct.except(viaWarc).isEmpty)
    // and the round trip recovers the original text (single-line corpus)
    val back = viaWarc.withColumnRenamed("t", "text")
    assert(back.except(docs.select("text")).isEmpty)
  }

  test("Curate.run htmlInput: curation over rendered pages ≡ curation over text") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(80)
    val pages = docs.select(col("doc_id"), concat(
      lit("<html><head><script>var x=1;</script></head><body>" +
        "<header>masthead</header><div><p>"),
      col("text"),
      lit("</p></div><aside>ads</aside></body></html>")).as("text"))
    val empty = spark.emptyDataFrame.select(lit(0L).as("doc_id"), lit("").as("text"))
      .where(lit(false))
    val fromHtml = Curate.run(pages, "doc_id", "text", evalSet = empty,
      htmlInput = true)
    val fromText = Curate.run(docs.select("doc_id", "text"), "doc_id", "text",
      evalSet = empty)
    assert(fromHtml.report === fromText.report,
      "stage counts must match: extraction feeds dedup/quality the same content")
    val a = fromHtml.docs.select("doc_id", "text", "split")
    val b = fromText.docs.select("doc_id", "text", "split")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }
}
