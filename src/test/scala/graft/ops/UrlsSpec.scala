package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Urls — rule-level canonicalization cases the round-trip oracle can't
  * isolate, the public-suffix longest-match ladder, and the composition
  * the operator exists for: domain-quota'd curation.
  */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("u").select(Urls.canonicalize(col("u"))).head.getString(0)

  private def regDom(h: String): Option[String] =
    Option(Seq(h).toDF("h").select(Urls.registeredDomain(col("h")))
      .head.getString(0))

  test("canonicalize: each documented rule, one witness each") {
    // scheme+host lowercase; path case preserved
    assert(canon("HTTP://WWW.Example.COM/Docs/A") ===
      "http://www.example.com/Docs/A")
    // fragment stripped
    assert(canon("https://a.com/p#Section-2") === "https://a.com/p")
    // default port stripped, non-default kept
    assert(canon("http://a.com:80/x") === "http://a.com/x")
    assert(canon("https://a.com:443/x") === "https://a.com/x")
    assert(canon("http://a.com:8080/x") === "http://a.com:8080/x")
    assert(canon("https://a.com:80/x") === "https://a.com:80/x") // not https default
    // empty path → /
    assert(canon("http://a.com") === "http://a.com/")
    assert(canon("http://a.com?b=1") === "http://a.com/?b=1")
    // userinfo stripped
    assert(canon("http://user:pw@a.com/x") === "http://a.com/x")
    // tracking params dropped (with and without values), survivors sorted
    assert(canon("http://a.com/p?b=2&utm_source=feed&a=1&gclid=XYZ&ref") ===
      "http://a.com/p?a=1&b=2")
    // all params tracking → no '?'
    assert(canon("http://a.com/p?utm_campaign=x&fbclid=1") === "http://a.com/p")
    // param ORDER collapses: permuted duplicates become one key
    assert(canon("http://a.com/p?x=1&y=2") === canon("http://a.com/p?y=2&x=1"))
    // whitespace trimmed
    assert(canon("  http://a.com/x ") === "http://a.com/x")
    // relative input: trim + defrag only, never invented authority
    assert(canon("/local/path#f") === "/local/path")
    // a param NAMED like a prefix of a tracking key survives
    assert(canon("http://a.com/p?utmost=1&reference=2") ===
      "http://a.com/p?reference=2&utmost=1")
  }

  test("canonicalize: null in, null out") {
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "u")
      .select(Urls.canonicalize(col("u"))).head
    assert(r.isNullAt(0))
  }

  test("host: authority minus userinfo and port, lowercased") {
    val h = Seq("HTTPS://User@News.BBC.co.uk:8443/x?q=1").toDF("u")
      .select(Urls.host(col("u"))).head.getString(0)
    assert(h === "news.bbc.co.uk")
    assert(Seq("no-scheme/path").toDF("u")
      .select(Urls.host(col("u"))).head.getString(0) === "")
  }

  test("registeredDomain: longest-match ladder (3-label > 2-label > default)") {
    assert(regDom("foo.blogspot.co.uk") === Some("foo.blogspot.co.uk"))
    assert(regDom("www.foo.blogspot.co.uk") === Some("foo.blogspot.co.uk"))
    assert(regDom("news.bbc.co.uk") === Some("bbc.co.uk"))
    assert(regDom("alice.github.io") === Some("alice.github.io"))
    assert(regDom("deep.sub.alice.github.io") === Some("alice.github.io"))
    assert(regDom("www.example.com") === Some("example.com"))
    assert(regDom("a.b.c.example.org") === Some("example.org"))
    // default rule: unlisted TLD is still a public suffix
    assert(regDom("www.site.xyz") === Some("site.xyz"))
  }

  test("registeredDomain: degenerate hosts have no registrable domain") {
    assert(regDom("com") === None)        // bare TLD
    assert(regDom("co.uk") === None)      // host IS a public suffix
    assert(regDom("github.io") === None)  // private-section suffix itself
    assert(regDom("localhost") === None)  // single label
    assert(regDom("") === None)
    // IPv4 literal: returned whole (the owner key a quota groups by)
    assert(regDom("192.168.0.1") === Some("192.168.0.1"))
  }

  test("composition: domain-quota'd curation caps each registered domain") {
    // 6 urls on bbc.co.uk across 2 subdomains, 2 on example.com — a
    // 2-per-domain quota must keep 2 + 2, treating subdomains as one site
    val urls = Seq(
      "http://news.bbc.co.uk/1", "http://news.bbc.co.uk/2",
      "http://www.bbc.co.uk/3", "http://www.bbc.co.uk/4",
      "http://sport.bbc.co.uk/5", "http://news.bbc.co.uk/6",
      "http://www.example.com/a", "http://example.com/b")
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("doc_id", "url")
    val keyed = Urls.withUrlKeys(urls, "url")
    val capped = Sampling.quotaCap(keyed, "registered_domain",
      Seq(col("doc_id")), n = 2)
    val byDom = capped.groupBy("registered_domain").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom === Map("bbc.co.uk" -> 2L, "example.com" -> 2L))
    // deterministic winners: lowest doc_id per domain
    assert(capped.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(0L, 1L, 6L, 7L))
  }
}
