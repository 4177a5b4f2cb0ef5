package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The composed curation pipeline over the real documents fixture: each
  * stage is individually oracled elsewhere; this spec verifies the
  * COMPOSITION contract — ordering, leakage guards, split-confined
  * packing, and end-to-end determinism.
  */
class CurateSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.Tables.documents(spark, sf)
    .select("doc_id", "text")

  test("full curation: stage counts monotone, quality gate holds, report consistent") {
    // contaminate deliberately: three corpus docs become the eval set
    val evalSet = docs.where($"doc_id".isin(5L, 17L, 42L))
    val out = Curate.run(docs, "doc_id", "text", evalSet,
      minQuality = 0.3)
    val r = out.report
    assert(r.input > 0)
    assert(r.afterExactDedup <= r.input)
    assert(r.afterNearDedup <= r.afterExactDedup)
    assert(r.afterDecontamination <= r.afterNearDedup)
    assert(r.afterQualityFilter <= r.afterDecontamination)
    val result = out.docs.cache()
    assert(result.count() == r.afterQualityFilter)
    // eval leakage: the eval docs themselves must be gone (each shares all
    // of its shingles with itself)
    assert(result.where($"doc_id".isin(5L, 17L, 42L)).count() == 0)
    // quality gate
    assert(result.where($"quality_score" < 0.3).count() == 0)
    // no surviving exact-duplicate text
    assert(result.groupBy("text").count().where($"count" > 1).count() == 0)
    result.unpersist()
  }

  test("packing is split-confined and deterministic across runs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    def run() = Curate.run(docs, "doc_id", "text", empty, report = false).docs
    val a = run().select("doc_id", "split", "pack_bucket", "pack_bin", "bin_offset")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val b = run().select("doc_id", "split", "pack_bucket", "pack_bin", "bin_offset")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(a == b, "curation is not deterministic across runs")
    // bins never straddle splits: within one (split, bucket, bin) the
    // offsets are dense from 0 — an offset can only be nonzero if a
    // same-split predecessor filled the space below it
    val out = run()
      .withColumn("__n", graft.ops.TextAnalysis.tokenCount($"text"))
    val binStart = out.groupBy("split", "pack_bucket", "pack_bin")
      .agg(min($"bin_offset").as("first_off"), count(lit(1)).as("n_docs"))
    // every bin's lowest offset begins exactly at a budget boundary
    // remainder (bin k starts at global offset k*budget within its
    // split-bucket stream) — only true if the stream was split-local
    assert(binStart.where($"first_off" >= lit(2048L)).count() == 0)
    val splitsSeen = out.select("split").distinct()
      .as[String].collect().toSet
    assert(splitsSeen.subsetOf(Set("train", "val", "test")))
    assert(splitsSeen.contains("train"))
  }
}
