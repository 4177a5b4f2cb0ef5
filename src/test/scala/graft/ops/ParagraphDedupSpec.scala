package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Paragraph-level boilerplate dedup (Dedup.dedupParagraphs) — the
  * semantics the oracle can't isolate: removal-everywhere (including the
  * first occurrence), within-doc repeats of non-viral paragraphs kept,
  * all-boilerplate docs surviving with empty text, order preservation.
  */
class ParagraphDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def run(df: org.apache.spark.sql.DataFrame, maxDocFreq: Long = 1L) =
    Dedup.dedupParagraphs(df, "doc_id", "text", "\n", maxDocFreq)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

  test("a paragraph in more docs than maxDocFreq is removed EVERYWHERE") {
    val out = run(docs(
      1L -> "unique one\nBOILER\nunique two",
      2L -> "BOILER\nother text",
      3L -> "solo paragraph"))
    // BOILER is in 2 docs > maxDocFreq=1: gone from BOTH, first included
    assert(out(1L) === (("unique one\nunique two", 3L, 1L)))
    assert(out(2L) === (("other text", 2L, 1L)))
    assert(out(3L) === (("solo paragraph", 1L, 0L)))
  }

  test("within-doc repeats of a non-viral paragraph are kept (distinct-doc evidence)") {
    // "twice" repeats INSIDE doc 1 only — doc_freq is 1, not 2: kept both times
    val out = run(docs(1L -> "twice\nmiddle\ntwice", 2L -> "unrelated"))
    assert(out(1L) === (("twice\nmiddle\ntwice", 3L, 0L)))
  }

  test("an all-boilerplate doc survives with empty clean_text, not silence") {
    val out = run(docs(
      1L -> "B1\nB2",
      2L -> "B1\nB2",
      3L -> "B1\nkeep me"))
    assert(out(1L) === (("", 2L, 2L)))
    assert(out(2L) === (("", 2L, 2L)))
    assert(out(3L) === (("keep me", 2L, 1L)))
  }

  test("maxDocFreq admits up-to-threshold repetition") {
    val out = run(docs(
      1L -> "shared\na",
      2L -> "shared\nb",
      3L -> "c"), maxDocFreq = 2L)
    // shared is in exactly 2 docs = threshold: kept
    assert(out(1L) === (("shared\na", 2L, 0L)))
    assert(out(2L) === (("shared\nb", 2L, 0L)))
  }

  test("survivor order is the original paragraph order") {
    val n = 40
    val text = (0 until n).map(i => s"p$i").mkString("\n")
    // plant boilerplate between every survivor pair
    val noisy = (0 until n).map(i => s"p$i\nBOILER").mkString("\n")
    val out = run(docs(1L -> noisy, 2L -> "BOILER", 3L -> "BOILER"))
    assert(out(1L)._1 === text)
    assert(out(1L)._2 === 2L * n && out(1L)._3 === n.toLong)
  }

  test("empty paragraphs (doubled separators) are dropped from the count") {
    val out = run(docs(1L -> "a\n\nb\n", 2L -> "z"))
    assert(out(1L) === (("a\nb", 2L, 0L)))
  }

  test("maxDocFreq < 1 is rejected") {
    intercept[IllegalArgumentException] {
      Dedup.dedupParagraphs(docs(1L -> "x"), "doc_id", "text", "\n", 0L)
    }
  }
}
