package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.SparkContext

/** The partition-sizing rule from the multi-executor study (SCALING.md
  * §local-cluster), in code instead of prose.
  *
  * The study's finding: the ONLY local-cluster regressions (x10
  * `q_dedup_spans` 6.6×, `q_text_ngram_repetition` 3.3× under 4×8c×7g
  * executors) were per-task shuffle footprint, not operator shape — the
  * exploded window/n-gram streams give each of the static 32 partitions a
  * slice that fits a 128 GiB single JVM but spills a 7 GiB executor heap.
  * Either remedy restored parity: bigger executors, or a partition count
  * that scales with the data. This helper implements the second remedy as
  * the default for the explode-heavy operators, so the fix no longer
  * depends on a hand-set `SPARK_GRAFT_CPUS`.
  *
  * Why not AQE? Byte-based coalescing sizes an exchange by its MAP-OUTPUT
  * bytes, but these operators shuffle the compact corpus FIRST and explode
  * AFTER the exchange (by design — window text must never shuffle). The
  * bytes AQE sees are the small pre-explosion input; the footprint that
  * kills an 8 GiB heap materializes post-shuffle inside the window/explode
  * stage, invisible to runtime statistics. Only the operator knows its own
  * expansion factor, so the operator must pick the width.
  *
  * The rule: per-task post-explosion footprint ≤ executor heap ÷
  * (8 × concurrent tasks sharing that heap). Partitions = ceil(estimated
  * post-explosion bytes / that budget), floored at `defaultParallelism`
  * (never fewer waves than cores — the r4 measurement showed these
  * CPU-bound stages want all cores) and rounded UP to whole waves so the
  * last wave is not a straggler tail.
  *
  * Estimated post-explosion bytes = plan-stats input bytes ×
  * [[TextInflation]] × the operator's row multiplier (window lead width,
  * Σ of requested gram sizes, …). Plan stats are file-size based for
  * parquet scans (compressed); [[TextInflation]] is the measured ratio of
  * exploded in-memory UnsafeRow token-rows to compressed source bytes
  * (dictionary-encoded text column → ~(id + pos + token) rows). On the
  * x10 study fixture this rule yields 96–160 partitions for the two
  * regressed queries — the measured-good neighborhood (128 hand-set
  * restored parity) — while leaving every sf0.1 / x1 query at the
  * `defaultParallelism` floor (the bench plans are unchanged at small SF).
  */
object Conf {

  /** Measured compressed-parquet-text → exploded-token-row inflation.
    * Conservative for natural text (snappy+dictionary ≈ 2–4× on prose,
    * ~20× on the synthetic fixture's tiny vocab; UnsafeRow per-token
    * overhead ~8× raw token bytes). Over-estimating only adds partitions,
    * which AQE-era Spark schedules cheaply; under-estimating spills.
    */
  private[graft] val TextInflation = 32L

  /** Catalyst's unknown-size sentinel is `spark.sql.defaultSizeInBytes`
    * (Long.MaxValue by default) — and its DESCENDANTS: the size-only
    * stats visitor scales a unary node by its output/input row-width
    * ratio, so a narrow projection over a sentinel leaf reports
    * Long.MaxValue ÷ (small factor), not Long.MaxValue itself (r7
    * review). The band therefore starts at 2^53 ≈ 9 PiB: any sentinel
    * shrunk by a row-width ratio up to ~1000× (a 1-column projection of
    * a 1000-column schema) still lands above it and falls back to the
    * floor, while genuinely large-but-REAL estimates — the stated
    * multi-petabyte WARC case included, with ~9× headroom — fall under
    * it and are routed through the sizing arithmetic, where
    * [[MaxPartitions]] caps the width: real data must widen toward the
    * cap, never silently narrow to the floor (the per-task-spill regime
    * this rule exists to prevent). The r6 1 PiB cutoff mis-classified
    * large-real scans as unknown; the first r7 cut (Long.MaxValue/4)
    * mis-classified ratio-scaled sentinels as real. */
  private[graft] val UnknownStats = BigInt(1L) << 53

  /** Spark memory-conf string → bytes ("7g", "512m", "1024", "16gb");
    * unitless means MiB, matching Spark's memory-conf semantics. */
  private[graft] def memoryStringBytes(s: String): Long = {
    val t0 = s.trim.toLowerCase
    val t = if (t0.length > 1 && t0.endsWith("b") && !t0.dropRight(1).last.isDigit)
      t0.dropRight(1) else t0
    val (digits, mult) = t.last match {
      case 'k' => (t.dropRight(1), 1L << 10)
      case 'm' => (t.dropRight(1), 1L << 20)
      case 'g' => (t.dropRight(1), 1L << 30)
      case 't' => (t.dropRight(1), 1L << 40)
      case 'b' => (t.dropRight(1), 1L)
      case _   => (t, 1L << 20) // unitless = MiB (Spark memory confs)
    }
    require(digits.nonEmpty && digits.forall(_.isDigit),
      s"unparseable memory string: '$s'")
    digits.toLong * mult
  }

  private val LocalClusterMaster =
    """local-cluster\[\s*(\d+)\s*,\s*(\d+)\s*,\s*(\d+)\s*\]""".r
  private val LocalMaster = """local(\[.*\])?""".r

  /** (heap bytes, concurrent tasks) of one executor, from the master
    * string + confs. Pure core, unit-testable without a session.
    *
    *  - `local[N]`: the "executor" is this JVM — its real max heap, N
    *    task slots.
    *  - `local-cluster[n,c,mem]`: c slots; heap from
    *    `spark.executor.memory` if set (the launcher sets it), else the
    *    master string's MiB.
    *  - real cluster: `spark.executor.memory` (Spark default 1g) and
    *    `spark.executor.cores` (default 4 here — over-estimating slots
    *    shrinks the budget, i.e. errs toward MORE partitions, the safe
    *    direction).
    */
  private[graft] def executorResources(master: String, confMem: Option[String],
      confCores: Option[Int], jvmHeap: Long, defaultParallelism: Int): (Long, Int) =
    master match {
      case LocalClusterMaster(_, c, memMiB) =>
        (confMem.map(memoryStringBytes).getOrElse(memMiB.toLong << 20), c.toInt)
      case LocalMaster(_) => (jvmHeap, math.max(1, defaultParallelism))
      case _ =>
        (confMem.map(memoryStringBytes).getOrElse(1L << 30),
          confCores.getOrElse(4))
    }

  /** Per-task working-set budget: heap ÷ (8 × slots sharing it) — the
    * SCALING.md rule. Floored at 16 MiB so a degenerate conf cannot
    * explode the partition count unboundedly. */
  private[graft] def perTaskBudgetBytes(sc: SparkContext): Long = {
    val (heap, slots) = executorResources(sc.master,
      sc.getConf.getOption("spark.executor.memory"),
      sc.getConf.getOption("spark.executor.cores").map(_.toInt),
      Runtime.getRuntime.maxMemory, sc.defaultParallelism)
    math.max(heap / (8L * slots), 16L << 20)
  }

  /** Hard ceiling on a sized width. Two jobs: (a) a scheduler guard —
    * Catalyst's size-only join estimate is the PRODUCT of the children,
    * so a caller passing a post-join frame can report ~1e14 "bytes" that
    * are an artifact, not a size, and an explicit repartition(2^31) is a
    * driver collapse AQE cannot coalesce away (REPARTITION_BY_NUM pins
    * the count); (b) an honesty bound — past ~1M partitions, per-task
    * memory must come from executor sizing, not width (Spark's own
    * practical shuffle ceiling is well below this). */
  private[graft] val MaxPartitions: Long = 1L << 20

  /** Pure sizing arithmetic: ceil(bytes / budget), floored at
    * `defaultParallelism`, rounded up to whole waves of it, capped at
    * [[MaxPartitions]]. */
  private[graft] def partitionsFor(effectiveBytes: BigInt, budgetBytes: Long,
      defaultParallelism: Int): Int = {
    val dp = math.max(1, defaultParallelism)
    // the unknown-stats sentinel applies to RAW plan stats (the caller's
    // job — sizedShufflePartitions checks before multiplying); effective
    // bytes past any sane size are handled by the CAP, not a floor — a
    // genuinely huge exploded estimate must widen, not silently narrow
    if (effectiveBytes <= 0) dp
    else {
      val tasks = ((effectiveBytes + budgetBytes - 1) / budgetBytes)
        .min(BigInt(MaxPartitions)).toLong
      val waves = math.max(1L, (tasks + dp - 1) / dp)
      math.min(MaxPartitions, waves * dp).toInt
    }
  }

  /** Shuffle width for an operator that explodes `df` by `rowMultiplier`
    * post-shuffle (window lead width, Σ gram sizes, 1 for a plain token
    * explode). Falls back to `defaultParallelism` — the pre-r6 static
    * behavior — when plan stats are unknown. Driver-only plan-stats read;
    * no job. */
  def sizedShufflePartitions(df: DataFrame, rowMultiplier: Double): Int = {
    val sc = df.sparkSession.sparkContext
    val stats = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val effective =
      if (stats <= 0 || stats >= UnknownStats) BigInt(-1) // sentinel → floor
      else (BigDecimal(stats) * TextInflation * rowMultiplier).toBigInt
    partitionsFor(effective, perTaskBudgetBytes(sc), sc.defaultParallelism)
  }
}
