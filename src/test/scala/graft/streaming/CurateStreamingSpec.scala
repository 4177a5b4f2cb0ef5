package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming incremental curation ([[CurateStreaming]]): cross-batch
  * dedup through the persisted batch-partitioned index, and the
  * per-batch-overwrite replay determinism the exactly-once story rests
  * on.
  */
class CurateStreamingSpec extends SparkSpec {

  // pairwise-distinct bodies (shared stopword prefix for the quality
  // gate, then unique tokens — pairwise shingle Jaccard well under the
  // 0.7 near-dup threshold)
  private def doc(i: Int) =
    s"the story and the place for it is about " +
      (0 until 12).map(j => s"word${i}x$j").mkString(" ")

  test("stream: in-batch and cross-batch exact dups drop; index accumulates per batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("curstream").toString
    val (indexPath, outPath) = (s"$dir/index", s"$dir/out")
    val input = MemoryStream[(Long, String)]
    val q = CurateStreaming.curateIngestStream(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text",
      indexPath, outPath, s"$dir/ckpt")
    try {
      // batch 0: docs 1-4; doc 2 repeats doc 1's text (in-batch dup)
      input.addData((1L, doc(1)), (2L, doc(1)), (3L, doc(3)), (4L, doc(4)))
      q.processAllAvailable()
      // batch 1: docs 10-12; doc 10 repeats doc 1's text (cross-batch
      // dup — only the PERSISTED index can catch it)
      input.addData((10L, doc(1)), (11L, doc(11)), (12L, doc(12)))
      q.processAllAvailable()

      val out = spark.read.parquet(outPath)
      val ids = out.select("doc_id").as[Long].collect().toSet
      assert(!ids.contains(2L), "in-batch exact dup survived")
      assert(!ids.contains(10L), "cross-batch exact dup survived (index not probed)")
      assert(Set(1L, 3L, 4L, 11L, 12L).subsetOf(ids), s"unexpected drops: $ids")
      // partition layout: one directory per micro-batch
      assert(out.select("batch_id").distinct().as[Int].collect().toSet
        === Set(0, 1))
      // the index delta tracks dedup survivors per batch: 3 then 2
      val digests = spark.read.parquet(s"$indexPath/digests")
      assert(digests.groupBy("batch_id").count().as[(Int, Long)]
        .collect().toMap === Map(0 -> 3L, 1 -> 2L))
      // loadDedupIndex(beforeBatch) is exclusive: batch 1 probed 3 digests
      assert(CurateStreaming.loadDedupIndex(spark, indexPath, 1L)
        .digests.count() === 3L)
    } finally q.stop()
  }

  test("replaying a batch regenerates identical partitions (exactly-once)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("curreplay").toString
    val (indexPath, outPath) = (s"$dir/index", s"$dir/out")
    def run(batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
      CurateStreaming.ingestBatch(batch, id, "doc_id", "text", indexPath,
        outPath, n = 3, bands = 16, rowsPerBand = 4, minEstJaccard = 0.7,
        minQuality = 0.3)
    val b0 = Seq((1L, doc(1)), (2L, doc(2))).toDF("doc_id", "text")
    val b1 = Seq((5L, doc(1)), (6L, doc(6))).toDF("doc_id", "text")
    run(b0, 0L); run(b1, 1L)
    def snapshot() = (
      spark.read.parquet(outPath).drop("batch_id").collect().toSet,
      spark.read.parquet(s"$indexPath/digests").collect().toSet,
      spark.read.parquet(s"$indexPath/banded").collect().toSet)
    val before = snapshot()
    run(b1, 1L) // crash-recovery replay of the last batch
    assert(snapshot() === before, "replay changed persisted state")
    // cross-batch dup (doc 5) dropped in the original run and the replay
    assert(!spark.read.parquet(outPath).select("doc_id").as[Long]
      .collect().contains(5L))
  }
}
