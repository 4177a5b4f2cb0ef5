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

  /** One micro-batch body, exposed for deterministic-replay testing.
    * A batch with NO tokenizable tokens (CJK-only, emoji, empty bodies —
    * the worst coverage collapse there is) logs `oov_permyriad = NULL`,
    * never 0: zero would read as perfect coverage to an alert watching
    * the headline column at exactly the moment coverage vanished.
    * `n_docs` counts MEASURABLE docs (zero-token docs have no coverage
    * to measure and are absent from the per-doc audit by contract).
    */
  def monitorBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, vocab: DataFrame, outPath: String): Unit = {
    val perDoc = TextAnalysis.oovRate(batch, idCol, textCol, vocab)
    perDoc
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_oov")).as("n_oov"))
      .select(col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(col("n_tokens") > 0,
          floor(lit(10000L) * col("n_oov") / col("n_tokens")).cast("long"))
          .otherwise(lit(null).cast("long")).as("oov_permyriad"))
      .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
  }

  /** Start the monitor over `docs` (a streaming frame). Callers own
    * stop(); read the drift log with
    * `spark.read.parquet(outPath)` — (batch_id, n_docs, n_tokens,
    * n_oov, oov_permyriad). */
  def oovMonitorStream(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, outPath: String, checkpoint: String): StreamingQuery = {
    // freeze the vocabulary ONCE: frames are lazy, so an un-persisted
    // buildVocab-shaped vocab would re-run its full corpus aggregation
    // inside every micro-batch before re-broadcasting. Blocks release
    // with the session (or the caller unpersists after stop()).
    val frozen = vocab.persist()
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], batchId: Long) =>
        monitorBatch(batch.toDF(), batchId, idCol, textCol, frozen, outPath)
      }
      .start()
  }

  private val logSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_docs",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("n_tokens",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("n_oov",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("oov_permyriad",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("batch_id",
      org.apache.spark.sql.types.LongType)))

  /** Convenience: the drift log as one frame, newest first. Tolerates
    * "no batches yet" (a monitor's read path must not crash the poller
    * that races the first commit): empty frame, documented schema. */
  def driftLog(spark: SparkSession, outPath: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(outPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) || fs.listStatus(p).isEmpty)
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), logSchema)
    else
      spark.read.schema(logSchema).parquet(outPath)
        .orderBy(col("batch_id").desc)
  }
}
