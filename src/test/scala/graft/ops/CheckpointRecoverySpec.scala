package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

/** Block-loss behavior of the lineage-cut primitive (r11 verdict item #1).
  *
  * Lazy local checkpoints — the default lineage cut in every iterative op
  * (PageRank, Triangles, BPE, SemDeDup, bigram LM) — persist blocks on
  * the executors that computed them and TRUNCATE lineage, so an evicted
  * block is unrecomputable BY DESIGN and the consuming action dies with
  * "Checkpoint block rdd_X_Y not found". This suite pins all three layers
  * of the recovery story:
  *  1. the failure reproduces (evict a materialized lazy checkpoint, the
  *     action throws, [[Checkpoints.isBlockLoss]] recognizes it);
  *  2. [[Checkpoints.withBlockLossRetry]] heals it by rebuilding — the
  *     harness path Bench/Verify use;
  *  3. the opt-in RELIABLE mode ([[Checkpoints.ReliableConfKey]]) makes
  *     the same eviction a non-event — the cluster path, where executor
  *     loss is routine and a retry-rebuild of a 4-hour lineage is not a
  *     recovery story.
  */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  /** Evict the persisted blocks behind a cut frame (the LogicalRDD leaf —
    * the handle `Dataset.unpersist` cannot reach), simulating
    * memory-pressure eviction / executor loss mid-query. */
  private def evict(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(true)
      case other => fail(s"expected a LogicalRDD leaf, got ${other.getClass}")
    }

  private def edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L),
    (1L, 5L), (5L, 2L)).toDF("src", "dst")

  // FIRST in the suite: the checkpoint dir is CONTEXT-global and the
  // reliable-mode test below sets it — the no-dir guard is only
  // exercisable before that (this suite is the only one that sets it)
  test("reliable mode without a checkpoint dir fails fast with guidance") {
    val s3 = spark.newSession() // isolated conf, shared context
    if (s3.sparkContext.getCheckpointDir.isEmpty) {
      s3.conf.set(Checkpoints.ReliableConfKey, "true")
      import s3.implicits._
      val df = Seq(1L).toDF("x")
      val e = intercept[IllegalArgumentException] { Checkpoints.cut(df) }
      assert(e.getMessage.contains("setCheckpointDir"))
    }
  }

  test("evicting a materialized lazy checkpoint kills the action; isBlockLoss matches") {
    val cut = edges.groupBy(col("src")).agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    assert(cut.count() == 5) // materialize the lazy checkpoint
    evict(cut)               // mid-query block loss
    val e = intercept[Throwable] { cut.collect() }
    assert(Checkpoints.isBlockLoss(e),
      s"expected a checkpoint-block-loss failure, got: $e")
    // an unrelated failure is NOT classified as block loss
    assert(!Checkpoints.isBlockLoss(new RuntimeException("boom")))
    assert(!Checkpoints.isBlockLoss(
      new RuntimeException("file not found: /x/y")))
  }

  test("withBlockLossRetry rebuilds and recovers; other failures propagate") {
    var built = 0
    var retried = 0
    val out = Checkpoints.withBlockLossRetry(retries = 1,
        onRetry = _ => retried += 1) {
      built += 1
      val cut = edges.groupBy(col("src")).agg(count(lit(1)).as("n"))
        .localCheckpoint(false)
      assert(cut.count() == 5)
      if (built == 1) evict(cut) // first attempt loses its blocks
      cut.collect()
    }
    assert(out.length == 5 && built == 2 && retried == 1,
      "the rebuild (fresh RDDs) must succeed on the second attempt")
    // a genuine query error is NOT retried
    var attempts = 0
    intercept[IllegalArgumentException] {
      Checkpoints.withBlockLossRetry(retries = 3) {
        attempts += 1
        throw new IllegalArgumentException("real bug")
      }
    }
    assert(attempts == 1)
    // retry budget exhausts: persistent block loss still surfaces
    var always = 0
    val e = intercept[Throwable] {
      Checkpoints.withBlockLossRetry(retries = 2) {
        always += 1
        val cut = edges.localCheckpoint(false)
        cut.count()
        evict(cut)
        cut.collect()
      }
    }
    assert(Checkpoints.isBlockLoss(e) && always == 3)
  }

  test("PageRank survives eviction through the harness retry") {
    // the exact r11 bench-error shape: ranks materialized once, the
    // internal checkpoints evicted (Bench.isolate unpersists ALL
    // persistent RDDs), then the frame is consumed again
    var evictOnce = true
    val ranks = Checkpoints.withBlockLossRetry(retries = 1) {
      val r = PageRank.runFixedPoint(edges, "src", "dst", iters = 6)
      r.count()
      if (evictOnce) {
        evictOnce = false
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      }
      r.collect()
    }
    assert(ranks.length == 5)
    assert(!evictOnce, "the eviction must actually have happened")
  }

  test("reliable mode: eviction is a non-event (cluster posture)") {
    val s2 = spark.newSession()
    val dir = Files.createTempDirectory("graft_reliable_ckpt").toString
    s2.sparkContext.setCheckpointDir(dir)
    s2.conf.set(Checkpoints.ReliableConfKey, "true")
    import s2.implicits._
    val e2 = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val cut = Checkpoints.cut(e2.groupBy(col("src")).agg(count(lit(1)).as("n")))
    assert(cut.count() == 3) // materializes INTO the checkpoint dir
    // drop every persisted block — reliable checkpoint reads survive
    // (files, not executor blocks); this is what executor loss does
    s2.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    assert(cut.collect().length == 3)
    // and a full operator runs end-to-end in reliable mode
    val tri = Triangles.countExact(
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b"), "a", "b")
      .collect()(0)
    assert(tri.getAs[Long]("n_triangles") == 1L)
  }

}
