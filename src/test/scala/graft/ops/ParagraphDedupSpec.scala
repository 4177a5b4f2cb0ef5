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

  // ---- within-doc line dedup ----

  private def runLines(df: org.apache.spark.sql.DataFrame) =
    Dedup.dedupLinesInDoc(df, "doc_id", "text", "\n")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

  test("line dedup keeps the FIRST occurrence and preserves order") {
    val out = runLines(docs(1L -> "a\nb\na\nc\nb", 2L -> "solo"))
    assert(out(1L) === (("a\nb\nc", 5L, 2L)))
    assert(out(2L) === (("solo", 1L, 0L)))
  }

  test("line dedup is strictly within-doc: cross-doc repeats untouched") {
    val out = runLines(docs(1L -> "shared\nmine", 2L -> "shared\nyours"))
    assert(out(1L) === (("shared\nmine", 2L, 0L)))
    assert(out(2L) === (("shared\nyours", 2L, 0L)))
  }

  test("line dedup drops empty lines; an all-empty doc is absent") {
    val out = runLines(docs(1L -> "a\n\na\n", 2L -> "\n\n"))
    assert(out(1L) === (("a", 2L, 1L)))
    assert(!out.contains(2L))
  }

  // ---- incremental pass ----

  private def runInc(batch: org.apache.spark.sql.DataFrame,
      index: org.apache.spark.sql.DataFrame, maxDocFreq: Long = 2L) = {
    val r = Dedup.dedupParagraphsIncremental(batch, index, "doc_id", "text",
      "\n", maxDocFreq)
    (r.docs.collect().map(x => x.getLong(0) ->
        ((x.getString(1), x.getLong(2), x.getLong(3)))).toMap,
      r.indexDelta.collect().map(x => x.getString(0) -> x.getLong(1)).toMap)
  }

  private def index(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("para", "doc_freq").select(md5(col("para")).as("pdigest"),
      col("doc_freq"))
  }

  test("incremental: index evidence pushes a once-in-batch paragraph over the threshold") {
    // BOILER has 2 historical docs; one more in this batch → 3 > 2: removed.
    // FRESH has 2 historical docs and none needed — absent from batch.
    val (out, delta) = runInc(
      docs(10L -> "BOILER\nkeep one", 11L -> "keep two"),
      index("BOILER" -> 2L, "FRESH" -> 2L))
    assert(out(10L) === (("keep one", 2L, 1L)))
    assert(out(11L) === (("keep two", 1L, 0L)))
    // the delta is the BATCH's evidence only (3 batch paragraphs, each in
    // one doc; FRESH is not echoed back from the index)
    assert(delta.size === 3 && delta.values.forall(_ === 1L))
  }

  test("incremental: an in-batch template needs no history to be removed") {
    val (out, _) = runInc(
      docs(1L -> "TPL\na", 2L -> "TPL\nb", 3L -> "TPL\nc"),
      index(), maxDocFreq = 2L)
    assert(out(1L) === (("a", 2L, 1L)))
    assert(out(3L) === (("c", 2L, 1L)))
  }

  test("incremental: combined evidence at exactly the threshold is kept") {
    val (out, _) = runInc(
      docs(1L -> "edge\nx"), index("edge" -> 1L), maxDocFreq = 2L)
    assert(out(1L) === (("edge\nx", 2L, 0L))) // 1 + 1 = 2, not > 2
  }

  test("incremental: the delta counts distinct batch docs per digest") {
    val (_, delta) = runInc(
      docs(1L -> "p\np", 2L -> "p\nq"), index(), maxDocFreq = 5L)
    val pd = spark.sql("SELECT md5('p') h, md5('q') g").collect()(0)
    assert(delta(pd.getString(0)) === 2L) // in-doc repeat counts once
    assert(delta(pd.getString(1)) === 1L)
  }
}
