package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar int8 quantization of embedding columns — the storage path for
  * large vector corpora: a 100 TB float32 embedding store compresses 4×
  * (plus two doubles of per-vector scale metadata), which is routinely the
  * difference between "fits on the cluster" and "doesn't" for ANN index
  * builds. Asymmetric per-vector affine quantization (the faiss
  * `SQ8`-style baseline): x → round((x − min) / scale), scale =
  * (max − min) / 255, dequant x̂ = min + code·scale.
  *
  * Everything is a narrow shuffle-free projection over codegen'd array
  * higher-order functions — per-row work, embarrassingly parallel at any
  * scale. All arithmetic is double-precision IEEE with a fixed operation
  * order, so the codes (and even the reconstruction error) are
  * bit-reproducible across engines — the oracle re-runs the identical
  * formula.
  */
object Quantize {

  private val span: Column = col("qmax") - col("qmin")
  private val scale: Column = span / lit(255.0)

  /** Adds per-vector quantization columns to `df`:
    * qmin/qmax (double), codes (array<long> in [0,255]). Constant vectors
    * (span 0) quantize to all-zero codes rather than dividing by zero.
    */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame =
    df
      .withColumn("__v", transform(col(vecCol), _.cast(DoubleType)))
      .withColumn("qmin", array_min(col("__v")))
      .withColumn("qmax", array_max(col("__v")))
      .withColumn("codes",
        when(span === lit(0.0),
          transform(col("__v"), _ => lit(0L)))
          .otherwise(transform(col("__v"),
            x => round((x - col("qmin")) / scale).cast(LongType))))

  /** Quantization audit at vector grain: code stats plus the max absolute
    * reconstruction error |x̂ − x| — the quality number that decides
    * whether SQ8 is acceptable for a given corpus before committing the
    * 4×-smaller layout.
    *
    * Runs the fused native kernel
    * ([[graft.functions.VectorExpressions.QuantizeAuditInt8F32]]): one
    * codegen'd pass per row, no intermediate arrays. [[auditInt8Hof]] is
    * the bit-parity reference formulation.
    */
  def auditInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.withColumn("__q",
        graft.functions.VectorFunctions.quantizeAuditInt8F32(col(vecCol)))
      .select(col(idCol),
        col("__q.n_dims").as("n_dims"),
        col("__q.qmin").as("qmin"), col("__q.qmax").as("qmax"),
        col("__q.c_sum").as("c_sum"),
        col("__q.c_min").as("c_min"), col("__q.c_max").as("c_max"),
        col("__q.max_abs_err").as("max_abs_err"))

  /** Quantized similarity scoring: integer dot product of two int8 code
    * arrays — the cheap first-pass scorer over an SQ8-compressed corpus
    * (faiss-style: scan the 4×-smaller codes, re-rank survivors with
    * full-precision vectors). Pure integer arithmetic: unlike float
    * cosine, the score is EXACTLY reproducible on any engine — quantized
    * retrieval is oracle-able end to end.
    */
  def codeDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  // ------------------------------------------- product quantization (PQ)

  /** Seeded per-subspace PQ codebooks (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011): `m` independent codebooks
    * of `kSub` centroids in the `dSub`-dim subspace. Deterministic
    * plan-time constants (one seed per subspace), the same
    * oracle-checkable posture as [[Similarity.fixedCentroids]] — a
    * production fit would train each codebook with the sampled or
    * distributed Lloyd paths in [[Similarity]].
    *
    * @param scale multiplier on the seeded Gaussian entries — match the
    *   data's coordinate magnitude (for unit-norm vectors of dim D, a
    *   coordinate's RMS is 1/√D) or the argmins collapse onto the
    *   smallest-norm centroid and every code word degenerates.
    */
  def pqCodebooks(m: Int, kSub: Int, dSub: Int,
      seed: Long = 11L, scale: Double = 1.0): Array[Array[Double]] =
    Array.tabulate(m)(i =>
      Similarity.fixedCentroids(kSub, dSub, seed + i).map(_ * scale))

  /** PQ encoding: each vector's `i`-th `dSub`-dim slice is assigned to its
    * nearest subspace centroid by the codegen'd `nearest_centroid_f32`
    * kernel — `m` independent argmins per row, emitted as one
    * `array<long>` code word. A 64-dim float vector (256 B) compresses to
    * `m` codes (8 B here): at 100 TB this 30× reduction is what makes the
    * ANN candidate scan IO-bound on codes instead of vectors. Narrow,
    * shuffle-free, embarrassingly parallel.
    */
  def pqEncode(vecs: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Double]], dSub: Int): DataFrame = {
    val codeCols = codebooks.zipWithIndex.map { case (cb, i) =>
      graft.functions.VectorFunctions.nearestCentroidF32(
        slice(col(vecCol), i * dSub + 1, dSub), cb, dSub).cast(LongType)
    }
    // passthrough: input columns survive, so composed pipelines (IVF-PQ)
    // keep their coarse assignment without a self-join
    vecs.withColumn("pq_codes", array(codeCols.toIndexedSeq: _*))
  }

  /** Pack an m-code PQ word into one BIGINT (code `i` in bits
    * [i·bits, (i+1)·bits)) — the storage-layout form: 8 four-bit codes
    * pack a 256 B vector into one 8-byte integer column, and a scalar
    * column keeps the code word sortable/comparable in any engine.
    */
  def pqPackWord(codes: Column, m: Int, bits: Int): Column = {
    require(m * bits <= 64,
      s"pqPackWord: m=$m codes x $bits bits = ${m * bits} bits exceed one " +
        "64-bit word; use a byte-array layout for larger configs")
    (0 until m).map(i => shiftleft(codes(i), i * bits))
      .reduce(_ bitwiseOR _)
  }

  /** Query→centroid squared-L2 tables, one per subspace, each distance
    * accumulated left-to-right — the single source of truth for ADC
    * arithmetic (engine AND oracle generators derive from this).
    */
  private[graft] def adcTables(codebooks: Array[Array[Double]], dSub: Int,
      query: Seq[Double]): Array[Array[Double]] = {
    val m = codebooks.length
    require(query.length == m * dSub, s"query dim ${query.length} != ${m * dSub}")
    Array.tabulate(m) { i =>
      val cb = codebooks(i)
      val kSub = cb.length / dSub
      Array.tabulate(kSub) { c =>
        var dist = 0.0; var j = 0
        while (j < dSub) {
          val d = query(i * dSub + j) - cb(c * dSub + j)
          dist += d * d; j += 1
        }
        dist
      }
    }
  }

  /** The ADC score over a `pq_codes` column: m table lookups summed in
    * fixed left-to-right order (explicit `+` chain, not a fold — the SQL
    * oracle's left-associative `+` reproduces the doubles bit-exactly).
    */
  private def adcColumn(tables: Array[Array[Double]]): Column =
    tables.zipWithIndex.map { case (t, i) =>
        element_at(typedLit(t.toSeq),
          col("pq_codes")(i).cast(IntegerType) + lit(1))
      }
      .reduceLeft(_ + _)

  /** PQ asymmetric-distance top-k (ADC): the query-to-centroid distance
    * table (`m × kSub` doubles) is computed ONCE at plan time and embedded
    * as literals; the corpus scan scores each code word by `m` table
    * lookups — no float vector is touched after encoding. Approximate by
    * construction (quantization error); re-rank survivors with the exact
    * kernel when recall matters.
    */
  def pqAdcTopK(vecs: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Double]], dSub: Int,
      query: Seq[Double], k: Int): DataFrame = {
    val m = codebooks.length
    pqEncode(vecs, idCol, vecCol, codebooks, dSub)
      .withColumn("adc_dist", adcColumn(adcTables(codebooks, dSub, query)))
      .orderBy(col("adc_dist"), col(idCol))
      .limit(k)
      .select(col(idCol),
        pqPackWord(col("pq_codes"), m, bitsPerCode(codebooks(0).length / dSub)).as("pq_word"),
        col("adc_dist"))
  }

  /** Residual IVF-PQ retrieval (the recall-correct composition): codes
    * quantize the residual x − c(x) instead of x itself — flat PQ wastes
    * code entropy re-describing the centroid offset that the coarse id
    * already carries. The fused `pq_residual_codes_f32` kernel computes
    * all m residual argmins in one codegen'd pass (no residual array
    * materialized); ADC tables are built per PROBED LIST from the query's
    * own residual q − c_ℓ and selected per row by centroid id. Same
    * plan-literal bit-exactness contract as [[ivfPqTopK]].
    */
  def ivfPqResidualTopK(vecs: DataFrame, idCol: String, vecCol: String,
      coarse: Similarity.IvfIndex, codebooks: Array[Array[Double]],
      dSub: Int, query: Seq[Double], k: Int, nprobe: Int): DataFrame = {
    val probeIds = coarse.probes(query, nprobe)
    val m = codebooks.length
    // per-centroid ADC tables from the query residual; only probed lists
    // are ever read, but the literal covers all k (tiny: k × m × kSub)
    val tablesPerCid: Seq[Seq[Seq[Double]]] = (0 until coarse.k).map { c =>
      val centroid = coarse.centroid(c)
      val qResidual = query.indices.map(j => query(j) - centroid(j))
      adcTables(codebooks, dSub, qResidual).map(_.toSeq).toSeq
    }
    val cidTables = element_at(typedLit(tablesPerCid), col("centroid_id") + lit(1))
    val adc = (0 until m).map(i =>
        element_at(element_at(cidTables, i + 1),
          col("pq_codes")(i).cast(IntegerType) + lit(1)))
      .reduceLeft(_ + _)
    val scored = coarseProbe(vecs, idCol, vecCol, coarse, probeIds)
      .withColumn("pq_codes",
        graft.functions.VectorFunctions.pqResidualCodesF32(
          col(vecCol), col("centroid_id"), coarse.centroidsFlat, codebooks, dSub))
      .withColumn("adc_dist", adc)
    rankAndPack(scored, idCol, m, codebooks(0).length / dSub, k)
  }

  /** Coarse-assign + keep only the probed inverted lists — the shared
    * head of both IVF-PQ variants.
    */
  private def coarseProbe(vecs: DataFrame, idCol: String, vecCol: String,
      coarse: Similarity.IvfIndex, probeIds: Seq[Int]): DataFrame =
    vecs.select(col(idCol), col(vecCol))
      .withColumn("centroid_id",
        graft.functions.VectorFunctions.nearestCentroidF32(
          col(vecCol), coarse.centroidsFlat, coarse.dim))
      .where(col("centroid_id").isin(probeIds: _*))

  /** Rank by ADC distance (id tie-break), keep k, emit the packed code
    * word — the shared tail of every PQ retrieval (single definition so
    * the ranking/packing contract cannot drift between variants).
    */
  private def rankAndPack(scored: DataFrame, idCol: String, m: Int,
      kSub: Int, k: Int): DataFrame =
    scored
      .orderBy(col("adc_dist"), col(idCol))
      .limit(k)
      .select(col(idCol), col("centroid_id").cast(LongType).as("centroid_id"),
        pqPackWord(col("pq_codes"), m, bitsPerCode(kSub)).as("pq_word"),
        col("adc_dist"))

  /** Bits needed per code for a `kSub`-entry codebook. */
  private[graft] def bitsPerCode(kSub: Int): Int =
    math.max(1, 64 - java.lang.Long.numberOfLeadingZeros((kSub - 1).toLong).toInt)

  /** IVF-PQ: coarse-quantize the corpus into inverted lists, then
    * ADC-score ONLY the `nprobe` lists nearest the query — the composed
    * 100 TB retrieval path: the coarse predicate is a partition-prunable
    * small-int equality (a corpus written partitioned by `centroid_id`
    * reads just those partitions' files), and within the probed lists the
    * scan touches packed code words, never float vectors. Flat (IMI-style)
    * PQ within lists — codes quantize the vector itself, not the residual
    * x − c(x); residual encoding buys recall at the cost of per-list
    * codebook arithmetic and is the natural next refinement on a trained
    * index. Every stage here (coarse argmin, codes, ADC sums, ranking) is
    * deterministic plan-literal arithmetic, so the whole composed
    * retrieval is oracle-checkable bit-exactly.
    */
  def ivfPqTopK(vecs: DataFrame, idCol: String, vecCol: String,
      coarse: Similarity.IvfIndex, codebooks: Array[Array[Double]],
      dSub: Int, query: Seq[Double], k: Int, nprobe: Int): DataFrame = {
    val probeIds = coarse.probes(query, nprobe)
    val m = codebooks.length
    val scored = pqEncode(
        coarseProbe(vecs, idCol, vecCol, coarse, probeIds),
        idCol, vecCol, codebooks, dSub)
      .withColumn("adc_dist", adcColumn(adcTables(codebooks, dSub, query)))
    rankAndPack(scored, idCol, m, codebooks(0).length / dSub, k)
  }

  /** Higher-order-function reference formulation of [[auditInt8]] —
    * bit-identical output by contract (asserted in QuantizeSpec); kept as
    * the executable spec of the kernel's arithmetic.
    */
  def auditInt8Hof(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    quantizeInt8(df, vecCol)
      .select(col(idCol),
        size(col("__v")).cast(LongType).as("n_dims"),
        col("qmin"), col("qmax"),
        aggregate(col("codes"), lit(0L), (acc, c) => acc + c).as("c_sum"),
        array_min(col("codes")).as("c_min"),
        array_max(col("codes")).as("c_max"),
        when(span === lit(0.0), lit(0.0))
          .otherwise(array_max(zip_with(col("codes"), col("__v"),
            (c, x) => abs(col("qmin") + c.cast(DoubleType) * scale - x))))
          .as("max_abs_err"))
}
