package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Explicit release path for frames an operator persisted internally.
  *
  * Two storage mechanisms exist in this codebase and they release
  * DIFFERENTLY:
  *  - `.persist(...)` registers with the SQL CacheManager and releases
  *    through `Dataset.unpersist` (the [[Curate.IngestedBatch]] caches);
  *  - `.localCheckpoint(...)` persists the RDD inside the returned frame's
  *    [[LogicalRDD]] leaf — `Dataset.unpersist` only consults the
  *    CacheManager and silently NO-OPS on it (measured on this Spark:
  *    blocks survive `unpersist(true)`). The handle that works is the
  *    leaf RDD itself.
  *
  * [[release]] dispatches on the plan so callers hold ONE release call for
  * either mechanism. Ops that checkpoint internally hand their frames out
  * in a [[CachedResult.caches]] field (the repo rule since r5: a
  * long-running caller — e.g. a streaming job invoking an op per batch —
  * must be able to bound executor storage instead of waiting on
  * ContextCleaner GC); the caller releases AFTER consuming the result
  * (outputs are lazy — releasing first silently recomputes).
  */
object Checkpoints {

  /** Unpersist whatever storage backs `df`. Returns true when checkpoint
    * blocks were found on a [[LogicalRDD]] leaf (the path
    * `Dataset.unpersist` cannot reach), false when the frame released
    * through the CacheManager (or had nothing persisted — unpersist is
    * idempotent either way). */
  def release(df: DataFrame, blocking: Boolean = false): Boolean =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        lr.rdd.unpersist(blocking)
        true
      case _ =>
        df.unpersist(blocking)
        false
    }

  /** An operator result plus the internally-persisted frames backing it.
    * Consume `df` (write/collect), then `release()` — same lifecycle as
    * [[Curate.IngestedBatch]], generalized. */
  final case class CachedResult(df: DataFrame, caches: Seq[DataFrame]) {
    def release(blocking: Boolean = false): Unit =
      caches.foreach(c => Checkpoints.release(c, blocking))
  }
}
