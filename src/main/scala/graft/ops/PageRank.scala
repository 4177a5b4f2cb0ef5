package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge list — the canonical iterative-numeric graph
  * workload (influence/centrality over citation, link, or interaction
  * graphs).
  *
  * Scale shape (same discipline as
  * [[Dedup.connectedComponents]]): each iteration is one shuffled
  * equi-join (ranks ⋈ edges on src) plus one partial-aggregatable sum to
  * dst grain — no driver-side per-row work; the two driver-visible
  * scalars per iteration (dangling mass, for mass conservation) are
  * 1-row aggregates, the iterative-algorithm analogue of a convergence
  * check. Every round is `localCheckpoint`ed lazily so lineage stays
  * constant-depth and the materializing action is the round's own
  * aggregate.
  *
  * Float caveat: rank sums are double aggregations whose low bits depend
  * on partition merge order — PageRank is therefore NOT cross-engine
  * oracle-able bit-exactly; verification is a driver-side reference
  * implementation under tolerance (PageRankSpec).
  */
object PageRank {

  /** @param edges   directed edge list (duplicate edges count as weight)
    * @param iters   fixed iteration count (10–20 suffices at damping 0.85)
    * @param damping probability of following an edge vs teleporting
    * @return (id, rank); ranks sum to ~1 (dangling mass redistributed)
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(true)
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
      .localCheckpoint(true)
    val n = nodes.count().toDouble

    var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
      .localCheckpoint(true)
    (0 until iters).foreach { _ =>
      val withDeg = ranks.join(outDeg, ranks("id") === outDeg("src"), "left_outer")
      // mass parked on dangling nodes (no out-edges) teleports uniformly
      val danglingMass = withDeg.where(col("out_deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
      val contribs = withDeg.where(col("out_deg").isNotNull)
        .select(col("id"), (col("rank") / col("out_deg")).as("contrib"))
        .join(e, col("id") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("in_mass"))
      val base = (1.0 - damping) / n + damping * danglingMass / n
      ranks = nodes
        .join(contribs.select(col("dst").as("id"), col("in_mass")), Seq("id"), "left_outer")
        .select(col("id"),
          (lit(base) + lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("rank"))
        .localCheckpoint(false) // materialized by next round's aggregates
    }
    ranks
  }

  /** Fixed-point PageRank: ranks are BIGINT multiples of 1/`scale`, and
    * every operation — contribution split, damping, teleport base — is
    * integer multiply/divide. Integer sums are associative and
    * commutative, so the result is independent of partition merge order
    * and therefore CROSS-ENGINE BIT-EXACT (the property the double
    * variant above fundamentally cannot have); the DuckDB oracle unrolls
    * the same recurrence as chained CTEs with `//` floor division.
    *
    * Precision: one unit = 1e-15 of total mass (plenty below any ranking
    * tie that matters); remainders dropped by integer division leak a few
    * ulps of mass per round — deterministically, identically in both
    * engines.
    *
    * Overflow bound: total mass is `scale` (1e15), so every sum is
    * ≤ 1e15 and every pre-division product ≤ dampingDen·scale ≈ 1e17,
    * far under 2^63. (DuckDB's SUM(BIGINT) widens to HUGEINT; the final
    * CAST normalizes.)
    *
    * Same iteration shape as [[run]]: per round one shuffled equi-join
    * plus a partial-aggregatable integer sum to dst grain, constant-depth
    * lineage via lazy localCheckpoint, and a 1-row dangling-mass
    * aggregate as the driver-visible scalar.
    */
  def runFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 10, dampingNum: Long = 85L, dampingDen: Long = 100L,
      scale: Long = 1000000000000000L): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(true)
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
      .localCheckpoint(true)
    val n = nodes.count()

    var ranks = nodes.select(col("id"), lit(scale / n).as("rank_fp"))
      .localCheckpoint(true)
    (0 until iters).foreach { _ =>
      val withDeg = ranks.join(outDeg, ranks("id") === outDeg("src"), "left_outer")
      val danglingMass = withDeg.where(col("out_deg").isNull)
        .agg(coalesce(sum(col("rank_fp")), lit(0L))).head().getLong(0)
      val contribs = withDeg.where(col("out_deg").isNotNull)
        .select(col("id"), expr("rank_fp div out_deg").as("contrib"))
        .join(e, col("id") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("in_mass"))
      // teleport + redistributed dangling mass, one integer expression;
      // evaluated in Scala Long arithmetic == the oracle's BIGINT `//`
      // (both operands nonnegative, so floor == truncate)
      val base = ((dampingDen - dampingNum) * scale + dampingNum * danglingMass) /
        (dampingDen * n)
      ranks = nodes
        .join(contribs.select(col("dst").as("id"), col("in_mass")), Seq("id"), "left_outer")
        .select(col("id"),
          (lit(base) +
            expr(s"($dampingNum * coalesce(in_mass, 0L)) div $dampingDen")).as("rank_fp"))
        .localCheckpoint(false) // materialized by next round's aggregates
    }
    ranks
  }
}
