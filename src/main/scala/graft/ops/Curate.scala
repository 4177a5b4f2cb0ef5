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
    * @param report       when true, each counted stage is persisted
    *                     (MEMORY_AND_DISK) before its count so no stage
    *                     prefix re-executes, intermediates are unpersisted
    *                     once the final stage is materialized, and the
    *                     returned frame reads from the retained last-stage
    *                     cache. When false (production mode) nothing is
    *                     counted or cached — the pipeline is one fully
    *                     lazy plan and observability is the caller's
    *                     metrics layer.
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
    val intermediates = scala.collection.mutable.ListBuffer.empty[DataFrame]
    // persist-then-count: each count touches only its OWN stage (the
    // parent is already cached), never the whole pipeline prefix
    def cnt(df: DataFrame): (DataFrame, Long) =
      if (!report) (df, -1L)
      else {
        val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        intermediates += p
        (p, p.count())
      }

    val input = if (report) docs.count() else -1L
    val (exact, nExact) =
      cnt(Dedup.dropExactDuplicates(docs, idCol, textCol))
    val (near, nNear) = cnt(Dedup.dropNearDuplicates(exact, idCol, textCol,
      minJaccard = minJaccard, maxDocFreq = maxDocFreq))
    // decontaminate's output is keyed "doc_id" regardless of idCol (the
    // shingle pipeline's canonical id name) — rename back for the join
    val contaminated = Dedup.decontaminate(near, evalSet, idCol, textCol,
        minShared = minShared)
      .select(col("doc_id").as(idCol))
    val (clean, nClean) = cnt(near.join(contaminated, Seq(idCol), "left_anti"))
    // stage the tokens ONCE: the quality expression reads them ~5 times
    // and the packer needs the count — inlining the tokenizer would
    // re-run regexp extraction per read (TextAnalysis's documented
    // production contract)
    val scored = clean
      .withColumn("__toks", TextAnalysis.tokens(lower(col(textCol))))
      .withColumn("quality_score",
        TextAnalysis.qualityScoreFromTokens(col("__toks")))
    val (kept, nKept) = cnt(scored.where(col("quality_score") >= minQuality))
    val split = Sampling.splitAssign(kept, idCol, splits)
    // pack within each split: the packing window is salted by the split
    // name so bins can never straddle split boundaries
    val packed = Sampling.packSequences(
      split.withColumn("__n_tokens", size(col("__toks")).cast(LongType)),
      idCol, "__n_tokens", budget = packBudget, buckets = packBuckets,
      bucketSalt = Some(col("split")))
      .drop("__n_tokens", "__toks")
    // the final stage is now counted/materialized through the cached
    // parents; earlier intermediates are no longer needed (kept's blocks
    // back the returned frame)
    if (report) intermediates.dropRight(1).foreach(_.unpersist(false))
    Curated(packed, CurationReport(input, nExact, nNear, nClean, nKept))
  }
}
