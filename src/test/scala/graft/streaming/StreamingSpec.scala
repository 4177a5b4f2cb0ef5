package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  test("availableNow file stream: hourly windowed aggregation over events") {
    // stream from a µs-timestamp copy of the events table (the streaming
    // parquet reader has no nanosAsLong shim)
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    graft.Tables.events(spark, sf).write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(graft.Tables.events(spark, sf).schema)
      .parquet(s"$dir/in")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    EventsStreaming.runAvailableNow(stream, "hourly_test", s"$dir/ckpt")
    // append mode emits only watermark-closed windows; all but the last
    // hour of a static file are closed, so this must be non-trivial
    val out = spark.table("hourly_test")
    assert(out.count() > 0)
    // cross-check against the batch equivalent (closed windows only)
    val batch = graft.Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val joined = out.select(col("window.start").as("h"), col("event_type"), col("n"))
      .join(batch.withColumnRenamed("n", "n_batch"), Seq("h", "event_type"))
    assert(joined.where(col("n") =!= col("n_batch")).count() == 0)
  }
}
