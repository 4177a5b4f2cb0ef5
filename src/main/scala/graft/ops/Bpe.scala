package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") as a
  * distributed operator: learn a merge table from a corpus, and apply a
  * learned merge table to segment text.
  *
  * Semantics (all deterministic, engine-reproducible):
  *  - pre-tokenization is the engine's standard `\w+` word stream
  *    ([[TextAnalysis.tokens]]); words train as bare character sequences
  *    (no end-of-word marker — documented simplification);
  *  - pair frequency counts EVERY adjacent symbol position (as
  *    subword-nmt does: "aaa" contributes (a,a) twice), weighted by the
  *    word's corpus count;
  *  - the merge chosen each round is the max-frequency pair with
  *    lexicographic (left, right) tie-break;
  *  - merging replaces matches greedily left-to-right without overlap:
  *    within each maximal run of consecutive match positions, even
  *    offsets merge ("aaaa" under (a,a) → [aa, aa]).
  *
  * Scale design (100 TB): training never iterates over the corpus — the
  * corpus collapses to the DISTINCT word-count table in one shuffle
  * (vocabulary grows sub-linearly with corpus size; ~10^7 rows at web
  * scale), and every merge round is two narrow passes over that table:
  * one window stage partitioned by word (pair marking + greedy-overlap
  * parity + rebuild) and one tiny pair-frequency aggregation, fused into
  * a single job per round by lazy per-round localCheckpoints. The
  * per-round top-1 collect is a 1-row model parameter fetch, the same
  * pattern as the distributed Lloyd fit
  * ([[Similarity.trainIvfCentroidsDistributed]]).
  */
object Bpe {

  /** One merge round over a (word, wcount, syms) frame: returns the
    * marked frame and the pair-frequency aggregate. Internal — the loop
    * drivers below own checkpointing.
    */
  private def pairFrequencies(words: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("word")).orderBy(col("pos"))
    words
      .select(col("word"), col("wcount"), posexplode(col("syms")).as(Seq("pos", "sym")))
      .withColumn("nxt", lead(col("sym"), 1).over(w))
      .where(col("nxt").isNotNull)
      .groupBy(col("sym").as("left"), col("nxt").as("right"))
      .agg(sum(col("wcount")).as("freq"))
  }

  /** Apply ONE merge (l, r) to every word's symbol sequence, greedy
    * left-to-right non-overlapping. One window stage over the word
    * partition; the rebuilt array comes from an order-independent
    * sorted-struct aggregation.
    */
  private def applyMerge(words: DataFrame, l: String, r: String): DataFrame = {
    val w = Window.partitionBy(col("word")).orderBy(col("pos"))
    val wRun = Window.partitionBy(col("word")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wGrp = Window.partitionBy(col("word"), col("grp"))
    val exploded = words
      .select(col("word"), col("wcount"), posexplode(col("syms")).as(Seq("pos", "sym")))
      .withColumn("nxt", lead(col("sym"), 1).over(w))
      .withColumn("m",
        col("sym") === lit(l) && col("nxt") === lit(r))
      // greedy-left overlap resolution: among consecutive match runs,
      // keep even offsets (grp = pos - running match count is constant
      // within a run; gmin anchors the run's first position)
      .withColumn("cm", sum(when(col("m"), 1).otherwise(0)).over(wRun))
      .withColumn("grp", when(col("m"), col("pos") - col("cm")))
      .withColumn("gmin", min(when(col("m"), col("pos"))).over(wGrp))
      .withColumn("keep_merge",
        col("m") && pmod(col("pos") - col("gmin"), lit(2)) === 0)
      .withColumn("absorbed", lag(col("keep_merge"), 1, false).over(w))
    exploded
      .where(!col("absorbed"))
      .withColumn("out_sym",
        when(col("keep_merge"), concat(col("sym"), col("nxt"))).otherwise(col("sym")))
      // group by word ALONE (wcount is functionally dependent — carried by
      // min): the output keeps HashPartitioning(word), which the next
      // round's window and rebuild both reuse — one tiny pair-frequency
      // shuffle per round is the loop's entire exchange budget
      .groupBy(col("word"))
      .agg(min(col("wcount")).as("wcount"),
        transform(array_sort(collect_list(struct(col("pos"), col("out_sym")))),
          s => s.getField("out_sym")).as("syms"))
  }

  /** Learned merge table: `numMerges` rows of
    * (merge_rank, lhs, rhs, freq), in learning order. Driver-side loop;
    * each round lazily localCheckpoints the re-segmented word table so
    * lineage stays constant-depth at one job per round.
    */
  def trainMerges(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // LAZY checkpoints: each round's argmax job is also the job that
    // materializes the round's re-segmented table (one job per round, not
    // two); a table's parent is unpersisted only AFTER the collect that
    // materialized the table (unpersisting a localCheckpoint a live lazy
    // child still depends on would lose its blocks)
    var words = wordTable(docs, textCol).localCheckpoint(false)
    var parent: Option[DataFrame] = None
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      // 1-row parameter fetch: the round's winning pair (this action
      // materializes `words`, making its parent safe to release)
      val top = pairFrequencies(words)
        .orderBy(desc("freq"), col("left"), col("right"))
        .limit(1).collect()
      parent.foreach(_.unpersist(false))
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step + 1, l, r, f))
        parent = Some(words)
        words = applyMerge(words, l, r).localCheckpoint(false)
        step += 1
      }
    }
    parent.foreach(_.unpersist(false))
    words.unpersist(false)
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "freq")
  }

  /** Segment the corpus with an ALREADY-LEARNED merge table: replay the
    * merges in rank order over the distinct word table, then map each
    * document's words through the final segmentation. Returns
    * (idCol, n_words, n_bpe_tokens): the corpus-budgeting numbers a
    * tokenizer consumer needs. The per-word segment table is the
    * broadcast side when small; the corpus side stays a narrow
    * projection.
    */
  def segmentCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    // pure declarative chain — every round has exactly one consumer (the
    // next round), so the whole replay plans as ONE job with no
    // checkpoints or driver round-trips
    var words = wordTable(docs, textCol)
    merges.foreach { case (l, r) => words = applyMerge(words, l, r) }
    val segSizes = words.select(col("word"), size(col("syms")).cast(LongType).as("n_sub"))
    docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .join(broadcast(segSizes), Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_bpe_tokens"))
  }

  /** Distinct words of the corpus with counts and their initial
    * character-level segmentation. Character split is explicit substring
    * indexing (identical semantics in any SQL engine — no regex-split
    * edge cases around empty strings).
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wcount"))
      .withColumn("syms", charSplit(col("word")))

  /** Character array of a string by explicit substring indexing. */
  private[graft] def charSplit(s: Column): Column =
    transform(sequence(lit(1), length(s)), i => substring(s, i, lit(1)))
}
