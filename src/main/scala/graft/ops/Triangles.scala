package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Triangle counting over an undirected edge list — the structural motif
  * behind clustering coefficients, community strength, and link-spam
  * signals.
  *
  * Scale shape: the naive 3-way self-join explodes on hub nodes (a degree-d
  * node contributes O(d²) wedges). The standard fix, used here: orient
  * every edge from its lower-(degree, id) endpoint to the higher one — a
  * total order, so each triangle survives as exactly ONE directed path
  * x→y→z plus its closing edge x→z — then count path⋈edge matches. Wedge
  * volume drops from Σ d² on raw degrees to the degeneracy-bounded Σ
  * in·out of the oriented graph (hubs receive edges; they rarely emit
  * them), the difference between feasible and not on power-law graphs.
  * Everything is shuffled equi-joins + one count: AQE handles residual
  * skew.
  *
  * For graphs too large even for that, [[approxSparsified]] implements
  * DOULION (Tsourakakis et al., KDD'09): keep each edge iff a hash accepts
  * it (probability 1/pInv), count triangles on the sample, scale by pInv³.
  * The md5-based edge sampler makes the SAMPLE deterministic and
  * engine-portable, so even the approximate count is oracle-checkable.
  */
object Triangles {

  /** Canonical undirected edge set: u < v, self-loops and duplicates out. */
  def canonical(edges: DataFrame, aCol: String, bCol: String): DataFrame =
    edges.select(least(col(aCol), col(bCol)).cast(LongType).as("u"),
        greatest(col(aCol), col(bCol)).cast(LongType).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

  /** One row: (n_nodes, n_edges, n_triangles) for the canonical graph.
    *
    * Shared subtrees are materialized ONCE via lazy localCheckpoints
    * (the bigramLogProb pattern — blocks free on ContextCleaner GC after
    * the caller's frame reference dies): the canonical edge set feeds
    * the degree table, the orientation join, and the edge count; the
    * degree table feeds both orientation legs and the node count. The
    * un-checkpointed form re-executed each consumer's whole upstream —
    * exchange REUSE never fires here because the edge-building subtrees
    * carry order-nondeterministic expressions (collect_set in the
    * co-purchase caller) — which the r11 x10 anatomy probe measured as
    * 42 exchanges / 16 sequential jobs for a 3-join query. */
  def countExact(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val und = canonical(edges, aCol, bCol).localCheckpoint(false)
    val deg = und.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    val du = deg.select(col("id").as("u"), col("deg").as("du"))
    val dv = deg.select(col("id").as("v"), col("deg").as("dv"))
    // orient low→high in the (deg, id) total order
    val directed = und.join(du, "u").join(dv, "v")
      .select(when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("x"), col("v").as("y")))
        .otherwise(struct(col("v").as("x"), col("u").as("y"))).as("e"))
      .select(col("e.x").as("x"), col("e.y").as("y"))
      .localCheckpoint(false) // feeds both path legs AND the closing probe
    val paths = directed.select(col("x"), col("y").as("m"))
      .join(directed.select(col("x").as("m"), col("y").as("z")), "m")
    // fresh aliases for the closing-edge leg: all three legs derive from
    // `directed`, and reusing its attributes verbatim would be ambiguous
    val closing = directed.select(col("x").as("cx"), col("y").as("cz"))
    val tri = paths.join(closing,
        col("x") === col("cx") && col("z") === col("cz"), "left_semi")
      .agg(count(lit(1)).cast(LongType).as("n_triangles"))
    val stats = und
      .agg(count(lit(1)).cast(LongType).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).cast(LongType).as("n_nodes")))
    stats.crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }

  /** DOULION: deterministic md5 edge sampling at rate 1/pInv, exact count
    * on the sample, unbiased estimate = count · pInv³ (exact in double for
    * any plausible count).
    */
  def approxSparsified(edges: DataFrame, aCol: String, bCol: String,
      pInv: Int = 10): DataFrame = {
    // The sampler is a pure function of the canonical (u, v) pair, so it
    // commutes with dedup: filter BEFORE the first distinct and the big
    // edge-instance stream never reaches a shuffle at full volume.
    // countExact's canonical() then dedups only the surviving ~1/pInv.
    val pre = edges.select(least(col(aCol), col(bCol)).cast(LongType).as("u"),
        greatest(col(aCol), col(bCol)).cast(LongType).as("v"))
      .where(col("u") =!= col("v"))
    val sampled = pre.where(
      conv(substring(md5(concat(col("u").cast("string"), lit("_"),
        col("v").cast("string"))), 1, 8), 16, 10)
        .cast(LongType) % pInv === 0)
    countExact(sampled, "u", "v")
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        (col("n_triangles") * lit(pInv.toDouble * pInv * pInv))
          .as("est_total"))
  }
}
