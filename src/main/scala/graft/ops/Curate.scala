package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** End-to-end training-data curation: the standard corpus-preparation
  * sequence — exact dedup → near dedup → eval decontamination → quality
  * filter → train/val/test split → per-split sequence packing — composed
  * from this engine's individually-oracled operators into ONE declarative
  * pipeline. Each stage is the already-verified implementation
  * ([[Dedup]], [[TextAnalysis]], [[Sampling]]); this object contributes
  * the composition contract, a run report, and the stage ordering that
  * matters at scale:
  *
  *  - exact dedup FIRST (16-byte digest shuffle removes the cheap mass
  *    before anything tokenizes);
  *  - near dedup on the survivors (the shingle pipeline never sees exact
  *    copies — at web scale exact duplicates are the bulk of duplication);
  *  - decontamination BEFORE quality filtering (a contaminated doc must
  *    drop even if high-quality — eval leakage is not negotiable, and the
  *    broadcast eval index makes this the cheapest stage);
  *  - the quality gate next (narrow, shuffle-free projection);
  *  - deterministic hash split, then packing WITHIN each split (packing
  *    first would let one bin straddle splits — leakage again).
  *
  * Every decision is a pure function of (doc_id, text), so the pipeline
  * is deterministic under retries and re-partitioning — the property that
  * lets a 100 TB curation run resume after any failure with identical
  * output.
  */
object Curate {

  /** Per-stage surviving-row counts, in pipeline order. */
  final case class CurationReport(input: Long, afterExactDedup: Long,
      afterNearDedup: Long, afterDecontamination: Long,
      afterQualityFilter: Long)

  final case class Curated(docs: DataFrame, report: CurationReport)

  /** Run the full curation over `docs(idCol, textCol)`.
    *
    * @param evalSet      held-out eval docs for decontamination (same
    *                     schema); pass an empty frame to skip
    * @param minQuality   [[TextAnalysis.qualityScore]] threshold in [0,1]
    * @param splits       per-myriad split weights (sum 10000)
    * @param packBudget   token budget per packed training bin
    * @param report       when false, skip the per-stage count actions —
    *                     production mode: counts cost one extra job per
    *                     stage and are observability, not semantics
    */
  def run(docs: DataFrame, idCol: String, textCol: String,
      evalSet: DataFrame,
      minJaccard: Double = 0.5, maxDocFreq: Long = 20L,
      minShared: Long = 3L,
      minQuality: Double = 0.3,
      splits: Seq[(String, Int)] =
        Seq(("train", 9000), ("val", 500), ("test", 500)),
      packBudget: Long = 2048L, packBuckets: Int = 32,
      report: Boolean = true): Curated = {
    def cnt(df: DataFrame): Long = if (report) df.count() else -1L

    val input = cnt(docs)
    val exact = Dedup.dropExactDuplicates(docs, idCol, textCol)
    val nExact = cnt(exact)
    val near = Dedup.dropNearDuplicates(exact, idCol, textCol,
      minJaccard = minJaccard, maxDocFreq = maxDocFreq)
    val nNear = cnt(near)
    val contaminated = Dedup.decontaminate(near, evalSet, idCol, textCol,
        minShared = minShared)
      .select(col(idCol))
    val clean = near.join(contaminated, Seq(idCol), "left_anti")
    val nClean = cnt(clean)
    val scored = clean.withColumn("quality_score",
      TextAnalysis.qualityScore(col(textCol)))
    val kept = scored.where(col("quality_score") >= minQuality)
    val nKept = cnt(kept)
    val split = Sampling.splitAssign(kept, idCol, splits)
    // pack within each split: bucket ids are salted by the split name so
    // bins can never straddle split boundaries
    val packed = Sampling.packSequences(
      split.withColumn("__n_tokens", TextAnalysis.tokenCount(col(textCol))),
      idCol, "__n_tokens", budget = packBudget, buckets = packBuckets,
      bucketSalt = Some(col("split")))
    Curated(packed.drop("__n_tokens"),
      CurationReport(input, nExact, nNear, nClean, nKept))
  }
}
