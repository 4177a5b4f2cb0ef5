package graft.ops

import graft.SparkSpec

/** BPE merge learning ([[Bpe.trainMerges]]): hand-derived merge tables on
  * the classic Sennrich corpus shape, greedy-overlap semantics, and the
  * apply path.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // low×5 lower×2 newest×6 widest×3 (no end-of-word marker)
  private val corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest")
  ).toDF("doc_id", "text")

  test("learned merges match the hand-derived table (freqs, lexicographic ties)") {
    val merges = Bpe.trainMerges(corpus, "text", numMerges = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // hand derivation:
    //  r1: (e,s)=9 beats (s,t)=9 on left tie-break
    //  r2: (es,t)=9
    //  r3: (l,o)=7 beats (o,w)=7
    //  r4: (lo,w)=7
    //  r5: (e,w)=6 beats (n,e)=6 and (w,est)=6
    assert(merges.toSeq === Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "l", "o", 7L),
      (4, "lo", "w", 7L),
      (5, "e", "w", 6L)))
  }

  test("greedy left-to-right overlap: aaaa under (a,a) becomes [aa, aa]") {
    val df = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    // aaaa: (a,a) positions 0,1,2 → keep 0,2; aaa: positions 0,1 → keep 0
    val merges = Bpe.trainMerges(df, "text", numMerges = 2)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: (a,a) freq 3+2=5; round 2 on [aa,aa] and [aa,a]:
    // (aa,aa)=1 and (aa,a)=1 → lexicographic left then right: (aa,a) wins
    assert(merges.toSeq === Seq(("a", "a", 5L), ("aa", "a", 1L)))
  }

  test("segmentCounts applies a learned table to per-doc subtoken budgets") {
    val out = Bpe.segmentCounts(corpus, "doc_id", "text",
        merges = Seq(("e", "s"), ("es", "t")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // newest → [n,e,w,est]: 6 words × 4; widest → [w,i,d,est]: 3 × 4
    assert(out(3L) === ((6L, 24L)))
    assert(out(4L) === ((3L, 12L)))
    // low/lower untouched by these merges: 5×3 and 2×5
    assert(out(1L) === ((5L, 15L)))
    assert(out(2L) === ((2L, 10L)))
  }

  test("merge table is invariant under corpus repartitioning") {
    val a = Bpe.trainMerges(corpus, "text", 4).collect().toSeq
    val b = Bpe.trainMerges(corpus.repartition(7), "text", 4).collect().toSeq
    assert(a === b)
  }
}
