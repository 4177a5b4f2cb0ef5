package graft.streaming

import graft.SparkSpec

/** Streaming OOV drift monitor ([[QualityStreaming]]): per-batch rates
  * against a frozen vocabulary, and replay idempotence.
  */
class QualityStreamingSpec extends SparkSpec {

  test("drift log: one row per batch, rates against the FROZEN vocab") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("oovstream").toString
    // frozen vocabulary: {known, words}
    val vocab = Seq("known", "words").toDF("token")
    val input = MemoryStream[(Long, String)]
    val q = QualityStreaming.oovMonitorStream(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text",
      vocab, s"$dir/out", s"$dir/ckpt")
    try {
      // batch 0: 4 tokens, 0 OOV
      input.addData((1L, "known words"), (2L, "words known"))
      q.processAllAvailable()
      // batch 1: 4 tokens, 2 OOV (drift! new tokens the vocab lacks)
      input.addData((3L, "known NEWTOK"), (4L, "words OTHERTOK"))
      q.processAllAvailable()
      val log = QualityStreaming.driftLog(spark, s"$dir/out")
        .collect().map(r => r.getAs[Long]("batch_id") ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
            r.getAs[Long]("n_oov"), r.getAs[Long]("oov_permyriad")))).toMap
      assert(log(0L) === ((2L, 4L, 0L, 0L)))
      assert(log(1L) === ((2L, 4L, 2L, 5000L)), "drift batch must read 50%")
    } finally q.stop()
  }

  test("an unmeasurable batch logs NULL rate, never a healthy-looking 0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("oovnull").toString
    val vocab = Seq("ok").toDF("token")
    // no \w+ token anywhere: coverage has collapsed entirely
    QualityStreaming.monitorBatch(
      Seq((1L, "!!! ---"), (2L, "")).toDF("doc_id", "text"), 0L,
      "doc_id", "text", vocab, s"$dir/out")
    val r = QualityStreaming.driftLog(spark, s"$dir/out").collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_docs") === 0L) // measurable docs only
    assert(r(0).getAs[Long]("n_tokens") === 0L &&
      r(0).getAs[Long]("n_oov") === 0L)
    assert(r(0).isNullAt(r(0).fieldIndex("oov_permyriad")),
      "collapsed coverage must not read as 0 = perfect")
  }

  test("driftLog tolerates 'no batches yet'") {
    val empty = QualityStreaming.driftLog(spark,
      java.nio.file.Files.createTempDirectory("oovempty").toString + "/nope")
    assert(empty.count() === 0)
    assert(empty.columns.toSet ===
      Set("n_docs", "n_tokens", "n_oov", "oov_permyriad", "batch_id"))
  }

  test("replaying a batch regenerates its row (exactly-once)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("oovreplay").toString
    val vocab = Seq("ok").toDF("token")
    def run(rows: Seq[(Long, String)], id: Long): Unit =
      QualityStreaming.monitorBatch(rows.toDF("doc_id", "text"), id,
        "doc_id", "text", vocab, s"$dir/out")
    run(Seq((1L, "ok bad")), 0L)
    val before = spark.read.parquet(s"$dir/out").collect().toSet
    run(Seq((1L, "ok bad")), 0L) // crash-recovery replay
    assert(spark.read.parquet(s"$dir/out").collect().toSet === before)
    assert(before.size === 1)
  }
}
