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
    assert(d("/report.pdf") === true)   // wildcard rule dropped
    assert(d("/") === true)             // no rule matches
    assert(d("/orphan-before-any-group") === true) // pre-group rule ignored
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
    assert(rules === Set("/private/", "/private/ok/", "/tmp"))
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

  test("META robots: the FIRST robots tag in document order wins") {
    val df = Seq(
      // content-first opt-out followed by a name-first 'all' — the later
      // tag must not override the earlier opt-out
      """<meta content="noindex" name="robots"><meta name="robots" content="all">""")
      .toDF("html")
    val out = Policy.withRobotsDirectives(df, "html")
      .select("robots_noindex").as[Boolean].head()
    assert(out === true,
      "a later robots META must not override the first tag's opt-out")
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
}
