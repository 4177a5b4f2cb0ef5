package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup

/** Streaming paragraph dedup ([[ParagraphStreaming]]): cross-batch
  * boilerplate evidence through the persisted per-batch frequency
  * deltas, parity with the sequential incremental operator, and the
  * replay determinism the exactly-once story rests on.
  */
class ParagraphStreamingSpec extends SparkSpec {

  test("stream: evidence accumulates across batches; index sums deltas") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("parastream").toString
    val (indexPath, outPath) = (s"$dir/index", s"$dir/out")
    val input = MemoryStream[(Long, String)]
    val q = ParagraphStreaming.paragraphDedupStream(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text",
      indexPath, outPath, s"$dir/ckpt", sep = "\n", maxDocFreq = 2L)
    try {
      // batch 0: BOILER in 2 docs = at threshold, kept everywhere
      input.addData((1L, "BOILER\nalpha"), (2L, "BOILER\nbeta"), (3L, "gamma"))
      q.processAllAvailable()
      // batch 1: one more BOILER doc → index(2) + batch(1) = 3 > 2:
      // removed from THIS batch (batch 0 emissions stand — documented
      // non-retroactivity)
      input.addData((10L, "BOILER\ndelta"), (11L, "epsilon"))
      q.processAllAvailable()

      val out = spark.read.parquet(outPath)
      val byId = out.collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_removed")))).toMap
      assert(byId(1L) === (("BOILER\nalpha", 0L)), "batch-0 emission must stand")
      assert(byId(10L) === (("delta", 1L)), "cross-batch evidence not probed")
      assert(byId(11L) === (("epsilon", 0L)))
      // the index as of batch 2 sums the per-batch distinct-doc deltas
      val idx = ParagraphStreaming.loadIndex(spark, indexPath, 2L)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(idx(spark.sql("SELECT md5('BOILER')").collect()(0).getString(0))
        === 3L)
    } finally q.stop()
  }

  test("stream ≡ sequential incremental operator, batch for batch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("parapar").toString
    val (indexPath, outPath) = (s"$dir/index", s"$dir/out")
    val b0 = Seq((1L, "T\na"), (2L, "T\nb")).toDF("doc_id", "text")
    val b1 = Seq((3L, "T\nc"), (4L, "d")).toDF("doc_id", "text")
    ParagraphStreaming.ingestBatch(b0, 0L, "doc_id", "text", "\n", 2L,
      indexPath, outPath)
    ParagraphStreaming.ingestBatch(b1, 1L, "doc_id", "text", "\n", 2L,
      indexPath, outPath)
    // the sequential twin: same operator, index threaded by hand
    val r0 = Dedup.dedupParagraphsIncremental(b0,
      ParagraphStreaming.loadIndex(spark, s"$dir/none", 0L),
      "doc_id", "text", "\n", 2L)
    val r1 = Dedup.dedupParagraphsIncremental(b1, r0.indexDelta,
      "doc_id", "text", "\n", 2L)
    val streamed = spark.read.parquet(outPath).drop("batch_id")
    val sequential = r0.docs.unionByName(r1.docs)
    assert(streamed.exceptAll(sequential).isEmpty &&
      sequential.exceptAll(streamed).isEmpty,
      "streamed outputs diverge from the sequential operator")
  }

  test("replaying a batch regenerates identical state (exactly-once)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("parareplay").toString
    val (indexPath, outPath) = (s"$dir/index", s"$dir/out")
    def run(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      ParagraphStreaming.ingestBatch(df, id, "doc_id", "text", "\n", 1L,
        indexPath, outPath)
    run(Seq((1L, "X\np"), (2L, "X\nq")).toDF("doc_id", "text"), 0L)
    run(Seq((3L, "X\nr")).toDF("doc_id", "text"), 1L)
    def snapshot() = (
      spark.read.parquet(outPath).drop("batch_id").collect().toSet,
      spark.read.parquet(indexPath).collect().toSet)
    val before = snapshot()
    // crash-recovery replay of the last batch: per-batch overwrite +
    // batch-bounded probe → bit-identical state, no double-counting
    run(Seq((3L, "X\nr")).toDF("doc_id", "text"), 1L)
    assert(snapshot() === before, "replay changed persisted state")
  }
}
