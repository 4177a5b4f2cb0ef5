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
        .collect().map(r => r.getAs[Int]("batch_id").toLong ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
            r.getAs[Long]("n_oov"), r.getAs[Long]("oov_permyriad")))).toMap
      assert(log(0L) === ((2L, 4L, 0L, 0L)))
      assert(log(1L) === ((2L, 4L, 2L, 5000L)), "drift batch must read 50%")
    } finally q.stop()
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
