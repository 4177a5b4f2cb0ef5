package graft.streaming

import graft.SparkSpec
import graft.ops.Policy

/** Streaming policy gate ([[PolicyStreaming]]): batch-parity of the
  * gated output, per-batch audit rows, and replay idempotence.
  */
class PolicyStreamingSpec extends SparkSpec {
  import spark.implicits._

  private val robotsBody = "User-agent: *\nDisallow: /private/"

  private def rules = Policy.parseRobots(
    Seq(("h.example", robotsBody)).toDF("host", "body"), "host", "body",
    "graftbot")

  private val pagesData = Seq(
    (1L, "https://h.example/private/a", "<html><body>x</body></html>"),
    (2L, "https://h.example/ok", "<html><body>x</body></html>"),
    (3L, "https://h.example/ok2",
      """<html><head><meta name="robots" content="noai"></head></html>"""),
    (4L, "https://nobots.example/x", "<html><body>y</body></html>"),
    (5L, "https://nobots.example/failed-fetch", null: String))

  test("stream gate matches the batch gate; audit row explains the drops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dir = java.nio.file.Files.createTempDirectory("polstream").toString
    val input = MemoryStream[(Long, String, String)]
    val q = PolicyStreaming.gateStream(
      input.toDS().toDF("page_id", "url", "html"), "url", "html",
      rules, s"$dir/out", s"$dir/ckpt")
    try {
      input.addData(pagesData: _*)
      q.processAllAvailable()
      val streamed = spark.read.parquet(s"$dir/out/kept")
        .select("page_id").as[Long].collect().toSet
      val batched = Policy.gate(
          pagesData.toDF("page_id", "url", "html"), "url", "html",
          hostRules = Some(rules))
        .where(org.apache.spark.sql.functions.col("policy_keep"))
        .select("page_id").as[Long].collect().toSet
      assert(streamed === batched)
      // robots drops 1, noai drops 3, null html drops 5
      assert(streamed === Set(2L, 4L))
      val audit = PolicyStreaming.auditLog(spark, s"$dir/out").head()
      assert(audit.getAs[Long]("n_pages") === 5L)
      assert(audit.getAs[Long]("n_kept") === 2L)
      assert(audit.getAs[Long]("n_null_html") === 1L)
      assert(audit.getAs[Long]("n_robots_blocked") === 1L)
      assert(audit.getAs[Long]("n_directive_blocked") === 1L)
    } finally q.stop()
  }

  test("re-delivered batch overwrites its directory — no duplicates") {
    val dir = java.nio.file.Files.createTempDirectory("polreplay").toString
    val batch = pagesData.toDF("page_id", "url", "html")
    PolicyStreaming.gateBatch(batch, 7L, "url", "html", rules, s"$dir/out")
    PolicyStreaming.gateBatch(batch, 7L, "url", "html", rules, s"$dir/out")
    assert(spark.read.parquet(s"$dir/out/kept").count() === 2L)
    assert(PolicyStreaming.auditLog(spark, s"$dir/out").count() === 1L)
  }

  test("auditLog tolerates 'no batches yet'") {
    val empty = PolicyStreaming.auditLog(spark,
      java.nio.file.Files.createTempDirectory("polempty").toString + "/no")
    assert(empty.count() === 0)
    assert(empty.columns.toSet === Set("n_pages", "n_kept", "n_null_html",
      "n_robots_blocked", "n_directive_blocked", "n_not_commercial",
      "batch_id"))
  }
}
