package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution: fuzzy matching with blocking — the textbook
  * formulation that makes edit-distance matching tractable at scale.
  *
  * An unblocked fuzzy join is O(n²) edit-distance evaluations — dead at
  * 100 TB. Blocking first reduces the candidate set to pairs sharing a
  * cheap deterministic key (first token, soundex, length band, …): the
  * self-join becomes a shuffled equi-join on the block key, and the
  * expensive `levenshtein` only runs inside blocks. Skewed blocks are
  * ordinary hot join keys — AQE skew-split applies; a stop-word block
  * ("the …") should be dropped the same way df-capped shingles are.
  */
object Fuzzy {

  /** Candidate matches among DISTINCT values of `nameCol`: pairs sharing
    * `blockKey(name)` with edit distance ≤ `maxDistance` (ordered pairs,
    * `name_a < name_b`).
    */
  def blockedMatches(df: DataFrame, nameCol: String,
      blockKey: Column => Column, maxDistance: Int): DataFrame = {
    val names = df.select(col(nameCol).as("name")).where(col("name").isNotNull)
      .distinct()
      .select(col("name"), blockKey(col("name")).as("block"))
    names.as("a")
      .join(names.as("b"),
        col("a.block") === col("b.block") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        levenshtein(col("a.name"), col("b.name")).as("distance"))
      .where(col("distance") <= maxDistance)
  }

  /** First whitespace token — the simplest blocking key. */
  def firstTokenBlock(name: Column): Column =
    split(name, " ").getItem(0)
}
