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

  test("batched == sequential where the greedy top pairs are symbol-disjoint") {
    // (a,b)=3, (c,d)=2, (e,f)=1 share no symbols: the sequential greedy
    // order is non-interacting, so one batch must learn the same table
    // with the same snapshot frequencies
    val disjoint = Seq((1L, "ab ab ab"), (2L, "cd cd"), (3L, "ef"))
      .toDF("doc_id", "text")
    val seq = Bpe.trainMerges(disjoint, "text", 3).collect().toSeq
    val bat = Bpe.trainMergesBatched(disjoint, "text", 3,
      maxBatch = 3, scanDepth = 6).collect().toSeq
    assert(bat === seq)
    assert(bat.size === 3)
  }

  test("batched schedule on interacting pairs: hand-derived acceptance scan") {
    // round-1 snapshot ranking: (e,s,9), (s,t,9), (l,o,7), (o,w,7) —
    // (s,t) conflicts with (e,s) on s, (o,w) with (l,o) on o, so the
    // maxBatch=2 batch is [(e,s), (l,o)]; after applying both, round 2
    // ranks (es,t,9) first and (lo,w,7) second (disjoint) — cap stops at
    // numMerges=4
    val merges = Bpe.trainMergesBatched(corpus, "text", numMerges = 4,
        maxBatch = 2, scanDepth = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq === Seq(
      (1, "e", "s", 9L),
      (2, "l", "o", 7L),
      (3, "es", "t", 9L),
      (4, "lo", "w", 7L)))
  }

  test("batched: produced-symbol conflicts are excluded from a batch") {
    // "abab baba": pairs (a,b)=4? — derive: tokens "abab"(1), "baba"(1).
    // abab: (a,b),(b,a),(a,b); baba: (b,a),(a,b),(b,a) → (a,b)=3, (b,a)=3.
    // (a,b) accepted; (b,a) shares both symbols — excluded. The batch is
    // size 1 even with maxBatch=4.
    val df = Seq((1L, "abab baba")).toDF("doc_id", "text")
    val merges = Bpe.trainMergesBatched(df, "text", numMerges = 1,
        maxBatch = 4, scanDepth = 4)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq === Seq(("a", "b", 3L)))
  }

  test("batched merge table is invariant under corpus repartitioning") {
    val a = Bpe.trainMergesBatched(corpus, "text", 5).collect().toSeq
    val b = Bpe.trainMergesBatched(corpus.repartition(7), "text", 5).collect().toSeq
    assert(a === b)
  }
  test("training releases its per-round checkpoints (bounded executor storage)") {
    // trainMerges/trainMergesBatched checkpoint the word table every round;
    // the rounds release in-loop via Checkpoints.release (Dataset.unpersist
    // no-ops on checkpoint blocks), so a call leaves NOTHING persisted
    val docs = Seq("low lower lowest", "new newer newest", "wide wider")
      .toDF("text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    assert(Bpe.trainMerges(docs, "text", numMerges = 4).count() == 4)
    assert(Bpe.trainMergesBatched(docs, "text", numMerges = 4).count() == 4)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"training left checkpoint blocks behind: $leaked")
  }

  private def rep(xs: Seq[Long], n: Int): Seq[Long] =
    Seq.fill(n)(xs).flatten

  test("vocab: base alphabet lexicographic, merge symbols at C+rank-1, first-wins dup") {
    // corpus chars sorted: d,e,i,l,n,o,r,s,t,w -> ids 0..9 (C = 10)
    val v = Bpe.vocab(corpus, "text", Seq(("e", "s"), ("es", "t")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v === Map("d" -> 0L, "e" -> 1L, "i" -> 2L, "l" -> 3L, "n" -> 4L,
      "o" -> 5L, "r" -> 6L, "s" -> 7L, "t" -> 8L, "w" -> 9L,
      "es" -> 10L, "est" -> 11L))
    // duplicate produced symbol: (ab,c) and (a,bc) both yield "abc" — the
    // earlier rank keeps the id, the later one leaves an unused id
    val dup = Seq((1L, "abc abc")).toDF("doc_id", "text")
    val v2 = Bpe.vocab(dup, "text", Seq(("a", "b"), ("ab", "c"), ("a", "bc")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v2 === Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "ab" -> 3L, "abc" -> 4L))
  }

  test("encode: hand-derived id sequences in text order") {
    val out = Bpe.encode(corpus, "doc_id", "text",
        merges = Seq(("e", "s"), ("es", "t")))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Long](1), r.getLong(2)))).toMap
    // vocab above: l=3 o=5 w=9 e=1 r=6 n=4 i=2 d=0, es=10, est=11
    assert(out(1L) === ((rep(Seq(3L, 5L, 9L), 5), 15L)))
    assert(out(2L) === ((rep(Seq(3L, 5L, 9L, 1L, 6L), 2), 10L)))
    assert(out(3L) === ((rep(Seq(4L, 1L, 9L, 11L), 6), 24L)))
    assert(out(4L) === ((rep(Seq(9L, 2L, 0L, 11L), 3), 12L)))
  }

  test("encode is invariant under corpus repartitioning") {
    val m = Seq(("e", "s"), ("es", "t"))
    val a = Bpe.encode(corpus, "doc_id", "text", m)
      .orderBy("doc_id").collect().toSeq
    val b = Bpe.encode(corpus.repartition(7), "doc_id", "text", m)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("decode inverts encode: reconstruction equals \\w+ tokens joined on empty") {
    val m = Seq(("e", "s"), ("es", "t"), ("l", "o"))
    val model = Bpe.symbolTable(corpus, "text", m)
    val decoded = Bpe.decode(
        Bpe.encode(corpus, "doc_id", "text", m), "doc_id", "token_ids", model)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(decoded(1L) === "low" * 5)
    assert(decoded(2L) === "lower" * 2)
    assert(decoded(3L) === "newest" * 6)
    assert(decoded(4L) === "widest" * 3)
  }

  test("decode poisons a document containing an unknown id to null") {
    val m = Seq(("e", "s"))
    val model = Bpe.symbolTable(corpus, "text", m)
    val bad = Seq((9L, Seq(0L, 999999L))).toDF("doc_id", "token_ids")
    val out = Bpe.decode(bad, "doc_id", "token_ids", model).head()
    assert(out.isNullAt(1), "unknown id must null the reconstruction, not shorten it")
  }

  test("symbolTable matches vocab's id convention") {
    val m = Seq(("e", "s"), ("es", "t"))
    val fromTable = Bpe.symbolTable(corpus, "text", m)
    val fromVocab = Bpe.vocab(corpus, "text", m)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromTable === fromVocab)
  }
}
