package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardWriterSpec extends SparkSpec {
  import spark.implicits._

  test("shard export: deterministic membership, manifest matches disk") {
    val docs = (0 until 500).map(i => (i.toLong, s"document body number $i"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("shards").toString

    val manifest = ShardWriter.writeShards(docs, dir, "doc_id", nShards = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(manifest.keySet == (0L until 8L).toSet, s"shards: ${manifest.keySet}")
    assert(manifest.values.map(_._1).sum == 500L)

    // every shard directory holds exactly ONE data file (repartition on the
    // shard key → one reducer per shard)
    (0 until 8).foreach { s =>
      val files = new java.io.File(s"$dir/shards/__shard=$s")
        .listFiles().count(_.getName.endsWith(".json"))
      assert(files == 1, s"shard $s has $files files")
    }

    // on-disk verification: counts and checksums agree for every shard
    val verified = ShardWriter.verifyShards(spark, dir)
    assert(verified.where(!col("ok")).count() == 0,
      verified.where(!col("ok")).collect().mkString(", "))

    // shard membership is a function of the row, not the partitioning:
    // re-exporting the same data differently partitioned → same manifest
    val dir2 = java.nio.file.Files.createTempDirectory("shards2").toString
    val manifest2 = ShardWriter
      .writeShards(docs.repartition(13).orderBy(col("text")), dir2, "doc_id", 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(manifest2 == manifest, "manifest must be partitioning-independent")
  }

  test("shard verification detects a tampered shard") {
    val docs = (0 until 100).map(i => (i.toLong, s"body $i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("shards3").toString
    ShardWriter.writeShards(docs, dir, "doc_id", nShards = 4)
    // tamper: delete one shard's data file
    val victim = new java.io.File(s"$dir/shards/__shard=2")
      .listFiles().filter(_.getName.endsWith(".json")).head
    assert(victim.delete())
    val verified = ShardWriter.verifyShards(spark, dir)
    val bad = verified.where(!coalesce(col("ok"), lit(false)))
      .select("shard").as[Long].collect()
    assert(bad.toSeq == Seq(2L), s"expected shard 2 flagged, got ${bad.toSeq}")
  }
}
