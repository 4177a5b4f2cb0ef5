package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental IVF list maintenance: batch-built parity, exactly-once
  * batch replay, frozen-quantizer persistence, and the probe's
  * partition-directory pruning.
  */
class IvfIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private def vec(seed: Int): Seq[Float] = {
    val r = new scala.util.Random(seed)
    Seq.fill(dim)(r.nextGaussian().toFloat)
  }
  private def corpus(ids: Range) =
    ids.map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  private val index =
    Similarity.IvfIndex(Similarity.fixedCentroids(k = 4, dim = dim), dim)
  private val query: Seq[Double] = vec(999).map(_.toDouble)

  test("two ingested batches probe identically to the batch-built index") {
    val p = java.nio.file.Files.createTempDirectory("ivf_incr").toString + "/idx"
    val all = corpus(0 until 200)
    Similarity.ivfIngestBatch(all.where(col("vec_id") < 100),
      "vec_id", "embedding", 0L, p, Some(index))
    Similarity.ivfIngestBatch(all.where(col("vec_id") >= 100),
      "vec_id", "embedding", 1L, p, Some(index))
    // ivfTopK's centroid_id is the kernel's int; the persisted lists use
    // long — normalize through Number for the comparison
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getAs[Number](2).longValue)).toSeq
    val incr = rows(Similarity.ivfListsProbe(spark, p, query, k = 10, nprobe = 2))
    val batch = rows(Similarity.ivfTopK(all, "vec_id", "embedding", index,
      query, k = 10, nprobe = 2))
    assert(incr == batch, "incremental index diverged from batch-built")
    assert(incr.size == 10)
  }

  test("re-delivered batch id overwrites its directory — no duplicates (exactly-once)") {
    val p = java.nio.file.Files.createTempDirectory("ivf_incr2").toString + "/idx"
    val b0 = corpus(0 until 50)
    Similarity.ivfIngestBatch(b0, "vec_id", "embedding", 0L, p, Some(index))
    val first = spark.read.parquet(s"$p/lists").collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    Similarity.ivfIngestBatch(b0, "vec_id", "embedding", 0L, p, Some(index))
    val second = spark.read.parquet(s"$p/lists").collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(second == first, "replay appended instead of overwriting")
  }

  test("the quantizer is persisted by the bootstrap batch and stays frozen") {
    val p = java.nio.file.Files.createTempDirectory("ivf_incr3").toString + "/idx"
    // bootstrap WITHOUT a pretrained index: batch 0 trains and persists
    val trained = Similarity.ivfIngestBatch(corpus(0 until 80),
      "vec_id", "embedding", 0L, p, pretrained = None, k = 4)
    val stored = Similarity.loadIvfIndex(spark, p).get
    assert(stored.centroidsFlat.toSeq == trained.centroidsFlat.toSeq)
    // a later batch arriving with a DIFFERENT pretrained index must not
    // re-geometry the existing lists: the persisted quantizer wins
    val other = Similarity.ivfIngestBatch(corpus(80 until 120),
      "vec_id", "embedding", 1L, p, Some(index))
    assert(other.centroidsFlat.toSeq == trained.centroidsFlat.toSeq,
      "frozen quantizer was replaced mid-index")
  }

  test("streaming ingest: two micro-batches probe identically to the batch-built index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = java.nio.file.Files.createTempDirectory("ivf_stream").toString
    val input = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.AnnStreaming.annIngestStream(
      input.toDS().toDF("vec_id", "embedding"), "vec_id", "embedding",
      s"$p/idx", s"$p/ckpt", Some(index))
    try {
      input.addData((0 until 60).map(i => (i.toLong, vec(i))): _*)
      q.processAllAvailable()
      input.addData((60 until 120).map(i => (i.toLong, vec(i))): _*)
      q.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getDouble(1),
          r.getAs[Number](2).longValue)).toSeq
      val streamed = rows(Similarity.ivfListsProbe(spark, s"$p/idx", query,
        k = 10, nprobe = 2))
      val batch = rows(Similarity.ivfTopK(corpus(0 until 120), "vec_id",
        "embedding", index, query, k = 10, nprobe = 2))
      assert(streamed == batch,
        "stream-maintained index diverged from batch-built")
    } finally q.stop()
  }

  test("probe plan prunes to the nprobe centroid partitions") {
    val p = java.nio.file.Files.createTempDirectory("ivf_incr4").toString + "/idx"
    Similarity.ivfIngestBatch(corpus(0 until 100),
      "vec_id", "embedding", 0L, p, Some(index))
    val probe = Similarity.ivfListsProbe(spark, p, query, k = 5, nprobe = 2)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*centroid_id".r.findFirstIn(plan).isDefined,
      s"centroid predicate did not reach partition pruning:\n$plan")
    // and the pruned read really returns only the probed lists' rows
    val probeIds = index.probes(query, 2).map(_.toLong).toSet
    val cents = probe.select("centroid_id").collect().map(_.getLong(0)).toSet
    assert(cents.subsetOf(probeIds))
  }
}
