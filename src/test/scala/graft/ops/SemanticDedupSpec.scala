package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SemDeDup ([[Dedup.semanticDedup]]): cluster-bounded cosine dedup with
  * greedy lowest-id keep, on hand-built two-cluster geometry.
  */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated centroids on the first two axes
  private val index = Similarity.IvfIndex(
    Array(1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0), dim = 4)

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "v")

  test("duplicates inside a cluster drop the higher id, keep the lowest") {
    val df = vecs(
      (1L, Seq(0.9f, 0.1f, 0f, 0f)),   // cluster 0
      (2L, Seq(0.9f, 0.1f, 0f, 0f)),   // exact dup of 1 → dropped
      (3L, Seq(0.9f, 0.1f, 0.001f, 0f)), // near dup of 1 → dropped
      (4L, Seq(0.1f, 0.9f, 0f, 0f)),   // cluster 1, unique
      (5L, Seq(0f, 0.8f, 0.6f, 0f))    // cluster 1, far from 4 → kept
    )
    val out = Dedup.semanticDedup(df, "vec_id", "v", index, minCosine = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) === ((0L, false)))
    assert(out(2L) === ((0L, true)))
    assert(out(3L) === ((0L, true)))
    assert(out(4L) === ((1L, false)))
    assert(out(5L) === ((1L, false)))
  }

  test("near-duplicates split across clusters are NOT compared (the documented SemDeDup bound)") {
    // two identical vectors equidistant-ish but assigned to different
    // centroids by construction: one leans to axis 0, one to axis 1
    val df = vecs(
      (1L, Seq(0.9f, 0.1f, 0f, 0f)),
      (2L, Seq(0.1f, 0.9f, 0f, 0f))
    )
    val out = Dedup.semanticDedup(df, "vec_id", "v", index, minCosine = 0.0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // even at threshold 0 nothing drops — candidates never cross clusters
    assert(out === Map(1L -> false, 2L -> false))
  }

  test("drop decisions are invariant under repartitioning") {
    val df = vecs((1 to 40).map(i =>
      (i.toLong, Seq((i % 7).toFloat, (i % 5).toFloat, 1f, 0.5f))): _*)
    val a = Dedup.semanticDedup(df, "vec_id", "v", index)
      .orderBy("vec_id").collect().toSeq
    val b = Dedup.semanticDedup(df.repartition(7), "vec_id", "v", index)
      .orderBy("vec_id").collect().toSeq
    assert(a === b)
  }
}
