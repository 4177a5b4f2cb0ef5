package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.TextAnalysis

/** Streaming corpus-quality drift monitor: per micro-batch, the
  * out-of-vocabulary rate of incoming documents against a FROZEN
  * vocabulary ([[TextAnalysis.buildVocab]] shape — the one the tokenizer
  * was trained on). This is the production half of the
  * [[TextAnalysis.oovRate]] acceptance check: the batch audit gates a
  * corpus before an expensive encode; this monitor watches yesterday's
  * vocabulary meet today's crawl and makes drift a TABLE (one row per
  * batch) instead of a post-mortem.
  *
  * Same exactly-once contract as the other foreachBatch sinks here:
  * per-batch-directory OVERWRITE, so a re-delivered batch regenerates
  * its row instead of appending a duplicate. The vocabulary is a static
  * frame broadcast into each micro-batch join — state never grows.
  */
object QualityStreaming {

  /** One micro-batch body, exposed for deterministic-replay testing. */
  def monitorBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, vocab: DataFrame, outPath: String): Unit = {
    val perDoc = TextAnalysis.oovRate(batch, idCol, textCol, vocab)
    perDoc
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_oov")).as("n_oov"))
      .select(col("n_docs"), col("n_tokens"), col("n_oov"),
        coalesce(floor(lit(10000L) * col("n_oov") / col("n_tokens"))
          .cast("long"), lit(0L)).as("oov_permyriad"))
      .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
  }

  /** Start the monitor over `docs` (a streaming frame). Callers own
    * stop(); read the drift log with
    * `spark.read.parquet(outPath)` — (batch_id, n_docs, n_tokens,
    * n_oov, oov_permyriad). */
  def oovMonitorStream(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, outPath: String, checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], batchId: Long) =>
        monitorBatch(batch.toDF(), batchId, idCol, textCol, vocab, outPath)
      }
      .start()

  /** Convenience: the drift log as one frame, newest first. */
  def driftLog(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(outPath).orderBy(col("batch_id").desc)
}
