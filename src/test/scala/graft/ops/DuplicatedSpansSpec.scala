package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Substring-level duplicated-span dedup ([[Dedup.duplicatedSpans]]):
  * hand-checked coverage on a corpus with planted repeated windows.
  */
class DuplicatedSpansSpec extends SparkSpec {
  import spark.implicits._

  // Doc 1 and 2 share the exact 4-token run "alpha beta gamma delta";
  // doc 3 repeats "one two three four" twice INSIDE itself (overlapping
  // coverage must union, not double-count); doc 4 is unique; doc 5 is
  // shorter than k.
  private val docs = Seq(
    (1L, "alpha beta gamma delta unique1 tail1 here1 now1"),
    (2L, "pre2 alpha beta gamma delta unique2 tail2 end2"),
    (3L, "one two three four one two three four closing3 words3"),
    (4L, "totally distinct content nothing shared at all here"),
    (5L, "too short")
  ).toDF("doc_id", "text")

  private lazy val stats = Dedup.duplicatedSpans(docs, "doc_id", "text", k = 4)
    .collect().map(r => r.getLong(0) -> r).toMap

  test("cross-doc repeated window covers exactly its k tokens in both docs") {
    // docs 1/2: single shared window "alpha beta gamma delta" → 4 covered
    val Row(_, n1, w1, c1, p1) = stats(1L)
    assert((n1, w1, c1) === (8L, 1L, 4L))
    assert(p1 === 5000L) // floor(4*10000/8)
    val Row(_, n2, _, c2, p2) = stats(2L)
    assert((n2, c2) === (8L, 4L))
    assert(p2 === 5000L)
  }

  test("self-repeated overlapping windows union their coverage") {
    // doc 3 tokens: one two three four one two three four closing3 words3
    // repeated 4-gram "one two three four" occurs at starts 0 and 4; also
    // "two three four one", "three four one two", "four one two three"
    // each occur once — not duplicated. Corpus-wide duplicated windows in
    // doc 3: starts {0, 4} → covered [0,4)∪[4,8) = 8 tokens, not 16.
    val Row(_, n3, w3, c3, p3) = stats(3L)
    assert(n3 === 10L)
    assert(w3 === 2L)
    assert(c3 === 8L)
    assert(p3 === 8000L)
  }

  test("unique and shorter-than-k docs report zero coverage") {
    val Row(_, _, w4, c4, p4) = stats(4L)
    assert((w4, c4, p4) === (0L, 0L, 0L))
    val Row(_, n5, w5, c5, p5) = stats(5L)
    assert((n5, w5, c5, p5) === (2L, 0L, 0L, 0L))
  }

  test("dropSpanDuplicated keeps only docs under the coverage threshold") {
    val kept = Dedup.dropSpanDuplicated(docs, "doc_id", "text", k = 4,
      maxPermyriad = 5000L).select("doc_id").as[Long].collect().sorted
    // docs 1/2 at exactly 5000 permyriad stay; doc 3 at 8000 is dropped
    assert(kept === Array(1L, 2L, 4L, 5L))
  }

  test("coverage is invariant under repartitioning") {
    val rep = Dedup.duplicatedSpans(docs.repartition(7), "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(rep === stats.map { case (id, r) => id -> r.getLong(3) })
  }
}
