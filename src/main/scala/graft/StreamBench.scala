package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Micro-batch latency study for the streaming curation twin (r8 verdict
  * stretch item): [[graft.streaming.CurateStreaming]] is parity-spec'd
  * against the batch composition, but parity says nothing about
  * LATENCY — the operational question for a streaming ingest is "what
  * batch size sustains what throughput, and does per-batch cost stay
  * O(|batch|) as the dedup index accumulates?".
  *
  * Protocol: for each batch size, a FRESH stream (own index/out/
  * checkpoint dirs) is warmed with one small batch (stream start + first
  * micro-batch pay one-time costs: state dir creation, codegen), then ONE
  * steady-state batch of the target size is timed end-to-end
  * (`processAllAvailable` = trigger + curate + both parquet sinks
  * committed). A final index-growth row re-measures a fixed-size batch
  * after several prior batches — per-batch cost must track batch size,
  * not corpus age (the O(|batch|) ingest contract).
  *
  * Batch texts are salted per batch so later batches are not dropped as
  * duplicates of earlier ones — every batch pays the FULL pipeline
  * (signatures, index probes, quality, sinks).
  *
  * Output: one JSON line → SCALING_STREAM.json, summarized in SCALING.md.
  */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // StudySession honors SPARK_GRAFT_MASTER, so the local-cluster twin
    // (scripts/local_cluster_bench.sh "<master>" graft.StreamBench) runs
    // the SAME code under real executor JVMs (r9 stretch item: the
    // streaming latency table was single-JVM-only evidence)
    val spark: SparkSession = StudySession.build()
    import spark.implicits._

    // document pool: text bodies from the bench corpus (bounded: 5 000
    // rows at sf0.1 — a parameter fetch, not a corpus collect)
    val pool = Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))

    def scratch(tag: String): String =
      java.nio.file.Files.createTempDirectory(s"graft_sb_$tag").toFile.getPath

    def deleteRecursively(path: String): Unit = {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(del)); f.delete(): Unit
      }
      del(new java.io.File(path))
    }

    def batchRows(size: Int, salt: String, idBase: Long): Seq[(Long, String)] =
      (0 until size).map(i =>
        (idBase + i, pool(i % pool.length) + " " + salt + "_" + i))

    def measure(size: Int, priorBatches: Int): (Double, Double) = {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val (idx, out, ck) = (scratch("idx"), scratch("out"), scratch("ck"))
      val q = graft.streaming.CurateStreaming.curateIngestStream(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text", idx, out, ck)
      try {
        // warm batch: stream start, sink dirs, codegen
        mem.addData(batchRows(100, "warm", 0L))
        q.processAllAvailable()
        var base = 1000000L
        (0 until priorBatches).foreach { b =>
          mem.addData(batchRows(size, s"prior$b", base))
          q.processAllAvailable()
          base += 1000000L
        }
        // build the batch BEFORE the clock starts: driver-side row
        // construction is not micro-batch latency
        val timedRows = batchRows(size, "timed", base)
        val t0 = System.nanoTime()
        mem.addData(timedRows)
        q.processAllAvailable()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, size / dt)
      } finally {
        q.stop()
        Seq(idx, out, ck).foreach(deleteRecursively)
      }
    }

    // SPARK_GRAFT_STREAM_SIZES narrows the grid (the local-cluster twin
    // runs just the 1000-doc row)
    val sizes = sys.env.get("SPARK_GRAFT_STREAM_SIZES")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(_.toInt))
      .filter(_.nonEmpty) // set-but-empty env falls back to the full grid
      .getOrElse(Seq(250, 500, 1000, 2000, 4000))
    val steady = sizes.map { s => val (dt, rps) = measure(s, 0); (s, dt, rps) }
    // index-growth check: same 1000-doc batch, after 5 prior batches
    val (dtAged, rpsAged) = measure(1000, priorBatches = 5)

    val rows = steady.map { case (s, dt, rps) =>
      s""""$s":{"sec":${f"$dt%.3f"},"docs_per_sec":${f"$rps%.1f"}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"stream_latency","sf":"$sfDir","batches":$rows,""" +
      s""""aged_1000_after_5_batches":{"sec":${f"$dtAged%.3f"},""" +
      s""""docs_per_sec":${f"$rpsAged%.1f"}}}""")
    spark.stop()
  }
}
