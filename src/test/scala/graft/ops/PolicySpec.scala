package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Policy — robots.txt group resolution and longest-match application,
  * META directive parsing, and license-family mapping: the rule-level
  * cases the arithmetic driver oracle can't isolate one at a time.
  */
class PolicySpec extends SparkSpec {
  import spark.implicits._

  private val robotsBody =
    """# top comment with Disallow: /decoy inside
      |Disallow: /orphan-before-any-group
      |
      |User-agent: badbot
      |Disallow: /
      |
      |User-agent: helper
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/ok/
      |Disallow: /tmp
      |Allow: /tmp          # tie with the Disallow — Allow must win
      |Disallow: /*.pdf$
      |Disallow:
      |Crawl-delay: 10
      |""".stripMargin

  private def rulesFor(agent: String) =
    Policy.parseRobots(Seq(("h.example", robotsBody)).toDF("host", "body"),
      "host", "body", agent)

  private def decide(agent: String, paths: Seq[String]): Map[String, Boolean] = {
    val pages = paths.map(p => ("h.example", p)).toDF("host", "path")
    Policy.applyRobots(pages, rulesFor(agent))
      .select("path", "robots_allowed").as[(String, Boolean)]
      .collect().toMap
  }

  test("star group: longest match wins, Allow wins ties, literal prefixes") {
    val d = decide("graftbot", Seq(
      "/private/x", "/private/ok/y", "/tmpfile", "/tmp", "/report.pdf",
      "/", "/orphan-before-any-group"))
    assert(d("/private/x") === false)   // Disallow /private/
    assert(d("/private/ok/y") === true) // longer Allow overrides
    assert(d("/tmpfile") === true)      // /tmp tie -> Allow wins
    assert(d("/tmp") === true)
    assert(d("/report.pdf") === false)  // /*.pdf$ wildcard ENFORCED
    assert(d("/") === true)             // no rule matches
    assert(d("/orphan-before-any-group") === true) // pre-group rule ignored
  }

  test("RFC 9309 wildcards: mid-pattern *, $ anchor, query interplay") {
    val body =
      """User-agent: *
        |Disallow: /*.pdf$
        |Disallow: /a/*/c
        |Disallow: /page?print=
        |""".stripMargin
    val rules = Policy.parseRobots(
      Seq(("w.example", body)).toDF("host", "body"), "host", "body", "*")
    val pages = Seq("/x.pdf", "/x.pdf?dl=1", "/x.pdfz", "/a/b/c",
      "/a/b/cdef", "/a//c", "/a/c", "/page?print=1", "/page")
      .map(p => ("w.example", p)).toDF("host", "path")
    val d = Policy.applyRobots(pages, rules)
      .select("path", "robots_allowed").as[(String, Boolean)]
      .collect().toMap
    assert(d("/x.pdf") === false,  "$-anchored rule blocks the bare path")
    assert(d("/x.pdf?dl=1") === true,
      "$ anchor must NOT match the query-carrying variant")
    assert(d("/x.pdfz") === true,  "$ anchor is an anchor, not a prefix")
    assert(d("/a/b/c") === false,  "mid-pattern * spans a segment")
    assert(d("/a/b/cdef") === false,
      "a wildcard rule is still a PREFIX match past its end")
    assert(d("/a//c") === false,   "* matches the empty string too")
    assert(d("/a/c") === true,
      "the literal / before c is still required — * is not optional-segment")
    assert(d("/page?print=1") === false,
      "literal ? rules match against path+query")
    assert(d("/page") === true)
  }

  test("multi-star rules match glob semantics; hostile star floods cannot hang the gate") {
    val bomb = "/" + ("*a" * 20) + "$" // the exponential-backtracking shape
    val body =
      s"""User-agent: *
         |Disallow: /x/*/y/*/z
         |Disallow: $bomb
         |""".stripMargin
    val rules = Policy.parseRobots(
      Seq(("w.example", body)).toDF("host", "body"), "host", "body", "*")
    // 60 chars of a's with a non-matching tail: the naive .*a.*a…$ regex
    // needs minutes here; the atomic translation must answer instantly
    val hostile = "/" + ("a" * 60) + "b"
    val pages = Seq("/x/1/y/2/z3", "/x//y//z", "/x/1/z/2/y", hostile,
      "/" + ("a" * 40))
      .map(p => ("w.example", p)).toDF("host", "path")
    val t0 = System.nanoTime()
    val d = Policy.applyRobots(pages, rules)
      .select("path", "robots_allowed").as[(String, Boolean)]
      .collect().toMap
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 30.0, s"hostile multi-star rule must not hang (took $sec s)")
    assert(d("/x/1/y/2/z3") === false, "two mid-pattern stars in order")
    assert(d("/x//y//z") === false, "* matches empty segments")
    assert(d("/x/1/z/2/y") === true, "segments must appear in order")
    assert(d(hostile) === true, "the bomb path does not match the bomb rule")
    assert(d("/" + ("a" * 40)) === false,
      "40 a's end-anchored DOES match the 20-star rule")
  }

  test("wildcard rule out-ranks a shorter literal by pattern length") {
    val body =
      """User-agent: *
        |Disallow: /private/
        |Allow: /private/*.html
        |""".stripMargin
    val rules = Policy.parseRobots(
      Seq(("w.example", body)).toDF("host", "body"), "host", "body", "*")
    val pages = Seq("/private/x.html", "/private/x.txt")
      .map(p => ("w.example", p)).toDF("host", "path")
    val d = Policy.applyRobots(pages, rules)
      .select("path", "robots_allowed").as[(String, Boolean)]
      .collect().toMap
    assert(d("/private/x.html") === true,
      "the 15-octet wildcard Allow must beat the 9-octet literal Disallow")
    assert(d("/private/x.txt") === false)
  }

  test("regex metacharacters in rule paths stay literal after translation") {
    // a path with ., (, ), + — only * and trailing $ are special in REP
    val body = "User-agent: *\nDisallow: /a.b(c)+/*x$\n"
    val rules = Policy.parseRobots(
      Seq(("w.example", body)).toDF("host", "body"), "host", "body", "*")
    val pages = Seq("/a.b(c)+/zzx", "/a.b(c)+/zzxy", "/aXb(c)+/zzx")
      .map(p => ("w.example", p)).toDF("host", "path")
    val d = Policy.applyRobots(pages, rules)
      .select("path", "robots_allowed").as[(String, Boolean)]
      .collect().toMap
    assert(d("/a.b(c)+/zzx") === false)
    assert(d("/a.b(c)+/zzxy") === true, "trailing $ still anchors")
    assert(d("/aXb(c)+/zzx") === true, "the dot must not match any char")
  }

  test("blank line between consecutive User-agent lines does not split the group") {
    val body =
      """User-agent: *
        |
        |User-agent: other
        |Disallow: /
        |""".stripMargin
    val rules = Policy.parseRobots(
      Seq(("w.example", body)).toDF("host", "body"), "host", "body", "*")
    val pages = Seq(("w.example", "/anything")).toDF("host", "path")
    val d = Policy.applyRobots(pages, rules)
      .select("robots_allowed").as[Boolean].head()
    assert(d === false,
      "RFC 9309 treats non-significant lines as transparent in a " +
        "multi-UA header: the star agent must inherit the shared rules")
  }

  test("specific agent group shadows every star group") {
    // badbot has its own group (Disallow /), so the star rules vanish
    val d = decide("BadBot", Seq("/", "/private/ok/y", "/anything"))
    assert(d.values.forall(_ == false))
    // an agent named only in a multi-UA header shares the star group
    val h = decide("helper", Seq("/private/x", "/private/ok/y"))
    assert(h("/private/x") === false && h("/private/ok/y") === true)
  }

  test("host with no robots row and empty path are allowed / normalized") {
    val pages = Seq(("nobots.example", "/x"), ("h.example", ""))
      .toDF("host", "path")
    val d = Policy.applyRobots(pages, rulesFor("graftbot"))
      .select("host", "robots_allowed").as[(String, Boolean)].collect().toMap
    assert(d("nobots.example") === true)
    assert(d("h.example") === true) // "" -> "/" which no rule matches
  }

  test("empty Disallow and comment-decoy rules never materialize") {
    val rules = rulesFor("graftbot")
      .select(explode(col("robots_rules")).as("r"))
      .select(col("r.prefix")).as[String].collect().toSet
    assert(rules === Set("/private/", "/private/ok/", "/tmp", "/*.pdf$"))
  }

  test("only wildcard rules carry a regex; literals keep the fast path") {
    val withRegex = rulesFor("graftbot")
      .select(explode(col("robots_rules")).as("r"))
      .select(col("r.prefix"), col("r.regex"))
      .as[(String, Option[String])].collect().toMap
    assert(withRegex("/private/") === None)
    assert(withRegex("/tmp") === None)
    assert(withRegex("/*.pdf$") === Some("^/.*\\.pdf$"))
  }

  test("robots host key is normalized SYMMETRICALLY: mixed case on either side joins") {
    val rules = Policy.parseRobots(
      Seq(("H.Example", "User-agent: *\nDisallow: /private/"))
        .toDF("host", "body"), "host", "body", "graftbot")
    // mixed-case robots host vs lowercase page AND lowercase robots vs
    // mixed-case page — one-sided normalization fails one of the two
    val pages = Seq(("h.example", "/private/x"), ("H.EXAMPLE", "/private/y"))
      .toDF("host", "path")
    val out = Policy.applyRobots(pages, rules)
      .select("host", "robots_allowed").as[(String, Boolean)]
      .collect().toMap
    assert(out("h.example") === false)
    assert(out("H.EXAMPLE") === false,
      "a mixed-case PAGE host must not silently skip the rules either")
  }

  test("META robots: directives union across ALL tags — an opt-out is never shadowed") {
    val df = Seq(
      // content-first opt-out followed by a name-first 'all'
      """<meta content="noindex" name="robots"><meta name="robots" content="all">""",
      // the REVERSE order: a benign first tag must not shadow the later
      // opt-out (the first-tag-only reading under-blocked exactly here)
      """<meta name="robots" content="all"><meta name="robots" content="noai">""",
      // opt-outs spread across two tags both register
      """<meta name="robots" content="noindex"><meta name="robots" content="nofollow">""")
      .toDF("html")
    val out = Policy.withRobotsDirectives(df, "html")
      .select("robots_noindex", "robots_nofollow", "robots_noai")
      .as[(Boolean, Boolean, Boolean)].collect()
    assert(out(0) === ((true, false, false)))
    assert(out(1) === ((false, false, true)),
      "a later noai opt-out must register even after a benign first tag")
    assert(out(2) === ((true, true, false)))
  }

  test("'none' directive implies noindex+nofollow; whitespace separators parse") {
    val df = Seq(
      """<meta name="robots" content="none">""",
      """<meta name="robots" content="noindex nofollow">""",
      """<meta name="robots" content="nonexistent">""")
      .toDF("html")
    val out = Policy.withRobotsDirectives(df, "html")
      .select("robots_noindex", "robots_nofollow", "robots_noai")
      .as[(Boolean, Boolean, Boolean)].collect()
    assert(out(0) === ((true, true, false)),
      "content=none is the standard noindex,nofollow equivalent")
    assert(out(1) === ((true, true, false)),
      "whitespace-separated directive lists occur in the wild")
    assert(out(2) === ((false, false, false)),
      "'nonexistent' must not token-match 'none'")
  }

  test("NULL html: no directives, no license, and the gate drops it explicitly") {
    val pages = Seq(("https://nobots.example/x", null: String))
      .toDF("url", "html")
    val out = Policy.gate(pages, "url", "html")
      .select("robots_noindex", "robots_noai", "license_commercial",
        "policy_keep")
      .as[(Boolean, Boolean, Boolean, Boolean)].head()
    assert(out === ((false, false, false, false)),
      "a failed fetch must drop as FALSE, never as a NULL that flips " +
        "with unrelated flags")
  }

  test("META robots: content-first order and intervening attributes match") {
    val df = Seq(
      """<meta content="noindex, nofollow" name="robots">""",
      """<meta name="robots" id="r" class="x" content="noai">""",
      """<meta name="robots" content="noarchive">""")
      .toDF("html")
    val out = Policy.withRobotsDirectives(df, "html")
      .select("robots_noindex", "robots_nofollow", "robots_noai")
      .as[(Boolean, Boolean, Boolean)].collect()
    assert(out(0) === ((true, true, false)))
    assert(out(1) === ((false, false, true)))
    assert(out(2) === ((false, false, false)))
  }

  test("license links: href-first order and <link> tags are detected") {
    val df = Seq(
      """<a href="https://example.com/lic" rel="license">terms</a>""",
      """<link rel="license" href="https://example.com/lic2">""",
      """<a href="https://example.com/plain">not a license link</a>""")
      .toDF("html")
    val out = Policy.withLicenseSignals(df, "html")
      .select("license_url", "license_family")
      .as[(Option[String], Option[String])].collect()
    assert(out(0) === ((Some("https://example.com/lic"), Some("other"))))
    assert(out(1) === ((Some("https://example.com/lic2"), Some("other"))))
    assert(out(2) === ((None, None)))
  }

  test("gate matches robots rules against path PLUS query, fragment stripped") {
    val body = "User-agent: *\nDisallow: /page?print=\nDisallow: /*.pdf$"
    val rules = Policy.parseRobots(
      Seq(("g.example", body)).toDF("host", "body"), "host", "body", "*")
    val pages = Seq(
      "https://g.example/page?print=1",   // literal ? rule fires
      "https://g.example/page",           // bare path clears it
      "https://g.example/doc.pdf",        // $ anchor fires
      "https://g.example/doc.pdf?dl=1",   // query defeats the $ anchor
      "https://g.example/doc.pdf#sec2")   // fragment is NOT part of the match
      .map(u => (u, "<html></html>")).toDF("url", "html")
    val out = Policy.gate(pages, "url", "html", hostRules = Some(rules))
      .select("url", "robots_allowed").as[(String, Boolean)]
      .collect().toMap
    assert(out("https://g.example/page?print=1") === false)
    assert(out("https://g.example/page") === true)
    assert(out("https://g.example/doc.pdf") === false)
    assert(out("https://g.example/doc.pdf?dl=1") === true)
    assert(out("https://g.example/doc.pdf#sec2") === false,
      "the fragment must be stripped before matching, not defeat the anchor")
  }

  test("gate link-density channel: audit column + threshold drop, NULL passes") {
    val pages = Seq(
      // link farm: ~all visible text inside anchors
      ("https://x.example/farm",
        """<html><body><a href="/1">aaaa</a> <a href="/2">bbbb</a> c</body></html>"""),
      // prose with one small link
      ("https://x.example/prose",
        """<html><body><p>plenty of ordinary prose text here</p><a href="/s">x</a></body></html>"""),
      // no visible text at all -> NULL density must PASS this channel
      ("https://x.example/empty", "<html><body></body></html>"))
      .toDF("url", "html")
    val out = Policy.gate(pages, "url", "html",
        maxLinkDensityPermyriad = Some(5000))
      .select("url", "link_density_pm", "policy_keep")
      .as[(String, Option[Long], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("https://x.example/farm")._1.get > 5000L)
    assert(out("https://x.example/farm")._2 === false)
    assert(out("https://x.example/prose")._1.get < 5000L)
    assert(out("https://x.example/prose")._2 === true)
    assert(out("https://x.example/empty") === ((None, true)),
      "emptiness is the content stages' call, not a link-density verdict")
    // the channel is OFF by default: no column, no keep contribution
    assert(!Policy.gate(pages, "url", "html").columns
      .contains("link_density_pm"))
  }

  test("gate never clobbers caller host/path columns") {
    val rules = rulesFor("graftbot")
    val pages = Seq(("https://h.example/private/a", "<html></html>",
        "caller-host", "caller-path"))
      .toDF("url", "html", "host", "path")
    val out = Policy.gate(pages, "url", "html", hostRules = Some(rules))
      .select("host", "path", "policy_keep")
      .as[(String, String, Boolean)].head()
    assert(out === (("caller-host", "caller-path", false)))
  }

  test("META robots directives: whole-token match, X-Robots-Tag merged") {
    val df = Seq(
      ("""<html><head><META name="robots" CONTENT="noindex, nofollow"></head></html>""", null),
      ("""<html><head><meta name="robots" content="index"></head></html>""", "noai"),
      ("""<html><head></head></html>""", null))
      .toDF("html", "x_robots")
    val out = Policy.withRobotsDirectives(df, "html", Some("x_robots"))
      .select("robots_noindex", "robots_nofollow", "robots_noai")
      .as[(Boolean, Boolean, Boolean)].collect()
    assert(out(0) === ((true, true, false)))
    assert(out(1) === ((false, false, true))) // "index" is not "noindex"
    assert(out(2) === ((false, false, false)))
  }

  test("gate composes robots + directives + license over a crawl frame") {
    val rules = rulesFor("graftbot")
    val pages = Seq(
      // blocked by robots (Disallow /private/)
      ("https://h.example/private/a", "<html><body>x</body></html>"),
      // clean page, no robots objection, no meta, no license
      ("https://h.example/ok", "<html><body>x</body></html>"),
      // robots-clean but noai META
      ("https://h.example/ok2",
        """<html><head><meta name="robots" content="noai"></head></html>"""),
      // host without robots.txt, CC-BY licensed
      ("https://other.example/x",
        """<a rel="license" href="https://creativecommons.org/licenses/by/4.0/">l</a>"""))
      .toDF("url", "html")
    val out = Policy.gate(pages, "url", "html", hostRules = Some(rules))
      .select("url", "policy_keep").as[(String, Boolean)].collect().toMap
    assert(out("https://h.example/private/a") === false)
    assert(out("https://h.example/ok") === true)
    assert(out("https://h.example/ok2") === false)
    assert(out("https://other.example/x") === true)
    // requireCommercial drops unlicensed pages, keeps the CC-BY one
    val strict = Policy.gate(pages, "url", "html", hostRules = Some(rules),
        requireCommercial = true)
      .select("url", "policy_keep").as[(String, Boolean)].collect().toMap
    assert(strict("https://h.example/ok") === false)
    assert(strict("https://other.example/x") === true)
  }

  test("license family mapping and clearance flags") {
    val cases = Seq(
      ("""<a rel="license" href="https://creativecommons.org/licenses/by/4.0/">x</a>""",
        Some("cc-by"), true, true),
      ("""<a href="http://creativecommons.org/licenses/by-nc-sa/3.0/">x</a>""",
        Some("cc-by-nc-sa"), false, true),
      ("""<a href="https://creativecommons.org/licenses/by-nd/2.5/it/">x</a>""",
        Some("cc-by-nd"), true, false),
      ("""<a href="https://creativecommons.org/publicdomain/zero/1.0/">x</a>""",
        Some("cc0"), true, true),
      ("""<a rel="license" href="https://example.com/terms">x</a>""",
        Some("other"), false, false),
      ("""<p>no license here</p>""", None, false, false))
    val out = Policy.withLicenseSignals(
        cases.map(_._1).toDF("html"), "html")
      .select("license_family", "license_commercial", "license_derivatives")
      .as[(Option[String], Boolean, Boolean)].collect()
    cases.zip(out).foreach { case ((_, fam, comm, deriv), got) =>
      assert(got === ((fam, comm, deriv)))
    }
  }

  test("parseRobotsAux: crawl-delay group resolution, sitemaps host-global") {
    val robots = Seq(
      // specific group shadows the star group's delay entirely
      ("H0.Example.com", // mixed-case host must normalize like parseRobots
        "Sitemap: https://h0/b.xml\n" + // before any group: still collected
          "User-agent: *\nCrawl-delay: 10\n\n" +
          "User-agent: bot\nCrawl-delay: 2\nDisallow: /y\n" +
          "Sitemap: https://h0/a.xml"),
      // specific group WITHOUT a delay: the star's 1.5 must NOT leak in
      ("h1", "User-agent: bot\nDisallow: /z\n\nUser-agent: *\nCrawl-delay: 1.5"),
      // non-numeric delay: NULL, not a crash; no sitemap: empty array
      ("h2", "User-agent: *\nCrawl-delay: soon"),
      // star delay applies when the agent is not named; two delays in
      // applying groups resolve to the MAX (conservative)
      ("h3", "User-agent: *\nCrawl-delay: 3\n\nUser-agent: *\nCrawl-delay: 7"))
      .toDF("host", "body")
    val out = Policy.parseRobotsAux(robots, "host", "body", agent = "bot")
      .orderBy("host")
      .select($"host", $"crawl_delay_sec", $"sitemaps")
      .as[(String, Option[Double], Seq[String])].collect()
    assert(out(0) === (("h0.example.com", Some(2.0),
      Seq("https://h0/a.xml", "https://h0/b.xml")))) // sorted
    assert(out(1) === (("h1", None, Seq.empty)))
    assert(out(2) === (("h2", None, Seq.empty)))
    assert(out(3) === (("h3", Some(7.0), Seq.empty)))
  }

  test("parseSitemap: urlset/sitemapindex entries, trim, corrupt routing") {
    val sm = Seq(
      ("u1", "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
        "<url><loc> https://a/1 \n</loc><lastmod> 2026-01-02 </lastmod></url>" +
        "<url><loc>https://a/2</loc></url>" +
        "<url><priority>0.5</priority></url>" + // no loc: routed, kept
        "<url><loc></loc></url>" +              // empty loc: NULL
        "<url><loc>https://a/3</url>" +         // unterminated loc: NULL
        "</urlset>"),
      ("u2", "<sitemapindex xmlns=\"x\">" +
        "<sitemap><loc>https://a/child1.xml</loc>" +
        "<lastmod>2026-02-03</lastmod></sitemap>" +
        "<sitemap><loc>https://a/child2.xml</loc></sitemap>" +
        "</sitemapindex>"),
      ("u3", "<urlset xmlns=\"x\"></urlset>"), // empty: one NULL-loc row
      ("u4", "<html>404 page</html>"))         // not a sitemap: NULL kind
      .toDF("sitemap_url", "body")
    val out = Policy.parseSitemap(sm, "sitemap_url", "body")
      .orderBy($"sitemap_url", $"loc")
      .as[(String, Option[String], Option[String], Option[String])]
      .collect()
    assert(out.toSeq === Seq(
      ("u1", Some("urlset"), None, None),           // <priority> only
      ("u1", Some("urlset"), None, None),           // empty loc
      ("u1", Some("urlset"), None, None),           // unterminated loc
      ("u1", Some("urlset"), Some("https://a/1"), Some("2026-01-02")),
      ("u1", Some("urlset"), Some("https://a/2"), None),
      ("u2", Some("sitemapindex"), Some("https://a/child1.xml"),
        Some("2026-02-03")),
      ("u2", Some("sitemapindex"), Some("https://a/child2.xml"), None),
      ("u3", Some("urlset"), None, None),
      ("u4", None, None, None)))
  }

  test("parseSitemap is linear on an open-flood body (no regex blowup)") {
    // 20k unterminated <url><loc> opens then one closing pair — the
    // shape that makes non-greedy block regexes O(opens x page); the
    // substring algebra must stay flat
    val flood = "<urlset xmlns=\"x\">" + ("<url><loc>https://f/x" * 20000) +
      "</loc></url></urlset>"
    val t0 = System.nanoTime()
    val rows = Policy.parseSitemap(Seq(("uf", flood)).toDF("u", "b"), "u", "b")
      .collect()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(rows.length == 1) // one </url> close → one entry
    assert(sec < 10.0, f"open-flood parse took $sec%.1f s")
  }
}
