package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → clean-text main-content extraction: the missing stage between a
  * WARC crawl scan ([[graft.sources.WarcSource]] lands raw HTML payloads)
  * and every text operator downstream (dedup, quality, language,
  * tokenization all assume clean text). The reference's own HTML handling
  * is a table scrape of one known page (`dags/sp500_dag.py.py:38-44`,
  * `pd.read_html`); this is the corpus-scale generalization: strip
  * markup and rule-listed boilerplate from ARBITRARY pages, jusText/
  * trafilatura-style but with a DETERMINISTIC rule set so results are
  * reproducible across engines and across reruns (a requirement the
  * ML-library extractors don't meet, and the property that lets the
  * DuckDB oracle verify the round trip).
  *
  * The whole extractor is a chain of built-in regexp/string expressions —
  * whole-stage-codegen'd, no UDF, no shuffle: at 100 TB it runs inside
  * the scan's codegen pass, so extraction is bandwidth-bound, never a
  * stage of its own.
  *
  * Rule list (ordered; each a single regex pass):
  *   1. drop comments `<!-- … -->` (they may contain tag-like text);
  *   2. drop the `<head>` block (title/meta/links are not content);
  *   3. drop `<script>`, `<style>`, `<noscript>`, `<template>` blocks
  *      (code, not content — tag-stripping alone would LEAK script text);
  *   4. drop structural boilerplate blocks: `<nav>`, `<header>`,
  *      `<footer>`, `<aside>` (menus, mastheads, link farms);
  *   5. block-level tags (`p div br h1–h6 li ul ol tr table section
  *      article blockquote pre`) become newlines — they separate text in
  *      rendering;
  *   6. every remaining tag is removed WITHOUT a separator — inline tags
  *      (`<b>`, `<a>`, `<span>`) do not break words in rendering;
  *   7. decode the fixed entity set `&nbsp; &lt; &gt; &quot; &#39;
  *      &apos;` then `&amp;` LAST (decoding `&amp;` first would
  *      double-decode `&amp;lt;`);
  *   8. normalize whitespace: spaces/tabs collapse, line edges trim,
  *      3+ newlines become the 2-newline block separator, ends trim.
  *
  * Known bound (documented, not hidden): block-removal regexes are
  * non-greedy first-close matchers, so a `<nav>` NESTED inside another
  * `<nav>` ends the outer block early — nested same-tag boilerplate is
  * vanishingly rare in real pages and the failure mode is extra text
  * kept (recall loss on the filter, never content loss).
  */
object Html {

  /** Remove `<tag …> … </tag>` blocks with first-close pairing — the
    * semantics of the non-greedy regex `(?is)<tag\b[^>]*>.*?</tag\s*>`,
    * implemented in GUARANTEED LINEAR time. The direct regexp_replace is
    * O(opens · page) when opens outnumber closes (each unmatched open's
    * `.*?` probe scans to end-of-page and fails — measured 25× throughput
    * collapse on adversarial open-flood pages, SCALING_R10_KERNELS), and
    * a crawl corpus contains adversarial pages by definition. Here:
    * split on the close tag (one linear scan), then per segment one
    * anchored linear scan removes first-open→end — the close that ended
    * the segment pairs with that open; a segment with no open had an
    * ORPHAN close, which the regex semantics keep in the text (re-emitted
    * canonically — any form of it is stripped by the later remove-all-
    * tags rule, so downstream output is identical).
    *
    * Attribute-embedded closes: in the regex form, an open tag whose
    * quoted attribute contains the close-tag TEXT (`<script
    * data-x="</script>">…`) consumes through that embedded close's `>`
    * and the block runs to the NEXT real close. The splitter would
    * instead treat the embedded text as the delimiter and leak the
    * payload — so a linear PRE-NORMALIZATION rewrites each
    * `<tag …[no >]… </tag>` occurrence to a bare `<tag>` first, which
    * reproduces the regex pairing exactly (spec-asserted on the
    * attr-embedded shapes). The attr scan is bounded by `[^<>]*` — each
    * candidate's scan stops at the nearest angle bracket, so the pass
    * stays linear even against `<tag<tag<tag…` floods; an attr that
    * contains BOTH another `<` and an embedded close (outside any real
    * markup) falls back to delimiter semantics rather than superlinear
    * time — the documented bound.
    *
    * Second documented divergence (nested-malformed): the pre-norm pass
    * runs globally, including on text that is block CONTENT under regex
    * semantics — on `<tag>x<tag a</tag>y</tag>z` it rewrites the inner
    * malformed open and consumes the close that terminated the outer
    * block, so this form yields `z` where the regex form yields `yz`.
    * The shape needs a malformed UNCLOSED open nested inside a closed
    * block; the failure mode is extra content dropped on such pages
    * (spec-asserted in HtmlSpec's divergence test).
    *
    * Equivalence to the regex form (spec-asserted, including nested,
    * unclosed, orphan-close, and attr-embedded adversarial cases): after
    * a match the regex resumes AFTER the consumed close — exactly the
    * next split segment; opens inside a removed block never re-match —
    * they sit in the removed suffix.
    */
  private def dropBlock(c: Column, tag: String): Column = {
    // EVERY multi-use value is bound as a lambda variable (the
    // single-element transform(array(...)) idiom): dropBlock calls nest 9
    // deep in htmlToText, and a bare `when(c.isNull, …)` or `size(segs)`
    // would re-evaluate its whole child subtree at every reference —
    // subexpression elimination does not reach these trees (the
    // documented O(n²)→O(3^depth) trap); a bound lambda variable is
    // evaluated exactly once.
    element_at(transform(array(c), page =>
      when(page.isNull, lit(null).cast("string"))
        .otherwise(element_at(transform(
          array(split(
            // pre-normalize attr-embedded closes (see scaladoc): an open
            // reaching a close with no intervening `>` (or `<`) becomes a
            // bare open, restoring the regex form's pairing
            regexp_replace(page, s"(?is)<$tag\\b[^<>]*</$tag\\s*>",
              s"<$tag>"),
            s"(?i)</$tag\\s*>")), segs => {
            // countdown ids (…, 2, 1): 1 marks the LAST segment
            val countdown = sequence(size(segs), lit(1), lit(-1))
            array_join(zip_with(segs, countdown, (seg, r) =>
              when(r === 1, seg) // after the last close: no pairing left
                .when(seg.rlike(s"(?is)<$tag\\b[^>]*>"),
                  // open…close removed: keep the prefix before the open
                  regexp_replace(seg, s"(?is)<$tag\\b[^>]*>.*", ""))
                // orphan close survives (canonical form; any form is
                // stripped by the later remove-all-tags rule)
                .otherwise(concat(seg, lit(s"</$tag>")))), "")
          }), 1))), 1)
  }

  /** Rules 1–4: comments, head, code blocks, and structural boilerplate
    * blocks removed — the markup that still remains is CONTENT markup.
    * Shared by [[htmlToText]] and [[linkDensityPermyriad]] so both
    * measure the same text universe. */
  private def stripNonContent(html: Column): Column = {
    var c = regexp_replace(html, "(?s)<!--.*?-->", "")
    c = dropBlock(c, "head")
    Seq("script", "style", "noscript", "template",
      "nav", "header", "footer", "aside").foreach { t => c = dropBlock(c, t) }
    c
  }

  /** Rule 7's entity decode, exposed for per-fragment reuse. */
  private def decodeEntities(c0: Column): Column = {
    var c = regexp_replace(c0, "&nbsp;", " ")
    c = regexp_replace(c, "&lt;", "<")
    c = regexp_replace(c, "&gt;", ">")
    c = regexp_replace(c, "&quot;", "\"")
    c = regexp_replace(c, "&#39;|&apos;", "'")
    regexp_replace(c, "&amp;", "&") // LAST: see rule 7
  }

  /** All markup removed, entities decoded, whitespace normalized —
    * rules 1–8. Blank-line boundaries (`\n\n`) mark block structure for
    * [[mainContent]]'s density gate. NULL in, NULL out. */
  def htmlToText(html: Column): Column =
    textFromStripped(stripNonContent(html))

  /** Rules 5–8 over an ALREADY-STRIPPED page ([[stripNonContent]]'s
    * output) — the tail [[htmlToText]] shares with
    * [[linkDensityPermyriad]], which binds the stripped page once and
    * derives both anchor mass and total mass from the same bound value
    * (running the full extraction chain twice made it the slowest kernel
    * on the r10 throughput table). */
  private def textFromStripped(stripped: Column): Column = {
    var c = regexp_replace(stripped,
      "(?i)</?(p|div|br|h[1-6]|li|ul|ol|tr|table|section|article|blockquote|pre)\\b[^>]*/?>",
      "\n")
    c = regexp_replace(c, "(?s)<[^>]*>", "")
    c = decodeEntities(c)
    c = regexp_replace(c, "\r", "")
    c = regexp_replace(c, "[ \t]+", " ")
    c = regexp_replace(c, " ?\n ?", "\n")
    c = regexp_replace(c, "\n{3,}", "\n\n")
    regexp_replace(c, "^\\s+|\\s+$", "")
  }

  /** Main content: [[htmlToText]] plus a text-density gate — blocks
    * (blank-line-separated runs) with fewer than `minBlockWords` words
    * are dropped (button labels, timestamps, cookie-notice fragments;
    * the jusText insight that short blocks are overwhelmingly
    * boilerplate). Surviving blocks rejoin under the 2-newline
    * separator. */
  def mainContent(html: Column, minBlockWords: Int = 3): Column = {
    val blocks = split(htmlToText(html), "\n{2,}")
    val kept = filter(blocks,
      b => b =!= "" && size(split(b, "\\s+")) >= minBlockWords)
    array_join(kept, "\n\n")
  }

  /** Fraction of visible text that sits inside `<a>` anchors, in integer
    * permyriad — THE classic boilerplate signal (link farms and nav
    * remnants score high, prose scores low); pair with [[mainContent]]
    * as a page-level keep/drop gate. NULL when the page has no visible
    * text.
    *
    * Numerator and denominator measure the SAME text universe: anchors
    * are extracted from the boilerplate-stripped page (an anchor inside
    * a removed `<nav>` contributes no visible text, so it must not
    * count), each anchor's inner text is tag-stripped, entity-decoded,
    * and whitespace-removed exactly like the denominator — so the value
    * is a true fraction, ≤ 10000.
    *
    * Single extraction pass (r10 verdict item): the boilerplate-stripped
    * page is bound ONCE as a lambda variable and BOTH masses derive from
    * it — the anchor scan reads it directly and the denominator applies
    * only the remaining text rules ([[textFromStripped]]); the previous
    * form re-ran the full strip chain for the denominator and was the
    * slowest kernel on the throughput table (~45 MB/s vs ~85 for
    * main_content). */
  def linkDensityPermyriad(html: Column): Column =
    element_at(transform(array(stripNonContent(html)), page => {
      // anchor inner texts via the SAME linear split-on-close technique
      // as dropBlock (the non-greedy `<a…>(.*?)</a>` extract_all is the
      // same O(opens·page) adversarial shape — and this kernel sits in
      // Policy.gate's hot path): per close-delimited segment, the
      // capture is everything after the segment's FIRST full open; a
      // final-region open never completes and contributes nothing,
      // matching the regex. Referenced once below.
      val anchorLen = when(page.isNull, lit(null).cast("int"))
        .otherwise(element_at(transform(array(split(
          regexp_replace(page, "(?is)<a\\b[^<>]*</a\\s*>", "<a>"),
          "(?i)</a\\s*>")), segs => {
            val countdown = sequence(size(segs), lit(1), lit(-1))
            val inners = zip_with(segs, countdown, (seg, r) =>
              when(r === 1 || !seg.rlike("(?is)<a\\b[^>]*>"),
                lit(null).cast("string"))
                .otherwise(
                  regexp_replace(seg, "(?is)^.*?<a\\b[^>]*>", "")))
            aggregate(filter(inners, a => a.isNotNull), lit(0),
              (acc, a) => acc + length(regexp_replace(
                decodeEntities(regexp_replace(a, "(?s)<[^>]*>", "")),
                "\\s", "")))
          }), 1))
      // the denominator is referenced twice (guard + division) — bound
      // as its own lambda variable so the text chain runs exactly once
      element_at(transform(
        array(length(regexp_replace(textFromStripped(page), "\\s", ""))),
        total => when(total > 0,
          floor(lit(10000) * anchorLen.cast("long") / total).cast("long"))
          .otherwise(lit(null).cast("long"))), 1)
    }), 1)
}
