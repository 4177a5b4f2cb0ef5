package graft

import org.apache.spark.sql.functions._

/** Guards the scale-fixture generator's load-bearing properties: if a
  * refactor silently breaks the planted-duplicate structure or lets
  * shingle document frequency scale with corpus size, the SCALING.md
  * study measures an empty pipeline and reports fake linearity (exactly
  * what happened with a fixed 30-word vocab at 10× — every shingle
  * blew past the dedup df-cap and the candidate set went to zero).
  */
class ScaleFixtureSpec extends SparkSpec {

  test("planted near-dups survive the dedup band at two scales; df stays bounded") {
    Seq(2000L, 8000L).foreach { n =>
      val docs = ScaleFixture.documents(spark, n).localCheckpoint(true)
      val pairs = ops.Dedup.jaccardPairs(docs, "doc_id", "text",
        n = 3, minJaccard = 0.5, maxDocFreq = 20L)
      val planted = pairs
        .where(col("id_b") === col("id_a") + 1 && col("id_b") % 20 === 19)
        .count()
      // every 20th doc is a planted near-copy of its predecessor; the
      // mutation rate keeps nearly all of them above Jaccard 0.5
      val expected = n / 20
      assert(planted >= expected * 8 / 10,
        s"n=$n: only $planted of ~$expected planted dup pairs survived")
      // candidate volume scales ~linearly, not quadratically: non-planted
      // pairs are a small fraction (random same-theme docs rarely clear 0.5)
      val total = pairs.count()
      assert(total <= expected * 3, s"n=$n: pair explosion ($total pairs)")
    }
  }

  test("fixture tables carry the schema surface the scale queries read") {
    val (li, orders, supplier) = ScaleFixture.star(spark, 1000, 250, 10)
    Seq("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_quantity")
      .foreach(c => assert(li.columns.contains(c)))
    Seq("o_orderkey", "o_orderdate").foreach(c => assert(orders.columns.contains(c)))
    assert(supplier.count() == 10)
    val emb = ScaleFixture.embeddings(spark, 100)
    assert(emb.schema("embedding").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false)
      || emb.schema("embedding").dataType.simpleString.startsWith("array<float>"))
    assert(emb.selectExpr("size(embedding)").distinct().head().getInt(0) == 64)
  }
}
