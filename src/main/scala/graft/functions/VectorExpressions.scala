package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expressions for embedding math over `array<float>`.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * correct but interpreted: each element pays lambda-dispatch overhead and
  * the zipped intermediate array is materialized per row. These expressions
  * fuse dot/norm/cosine into one tight primitive loop over the underlying
  * `ArrayData`, participate in whole-stage codegen via `doGenCode`, and
  * allocate nothing — at 100 TB of embeddings the brute-force scorer is
  * exactly this inner loop, so it must be a codegen'd kernel, not an
  * interpreted fold.
  *
  * Accumulation is left-to-right in double precision — bit-identical to the
  * HOF formulation it replaces, so DuckDB-oracle parity is preserved.
  * Null ELEMENTS inside vectors are not supported (embedding arrays are
  * dense by contract); null vectors propagate null.
  */
object VectorExpressions {

  /** cosine(a, b) = a·b / (‖a‖·‖b‖), one pass over both arrays. */
  case class CosineSimilarityF32(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<float> arguments, " +
            s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_f32"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (n, i) = (ctx.freshName("n"), ctx.freshName("i"))
        val (dot, na, nb) = (ctx.freshName("dot"), ctx.freshName("na"), ctx.freshName("nb"))
        val (x, y) = (ctx.freshName("x"), ctx.freshName("y"))
        s"""
           |int $n = Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = (double) $a.getFloat($i);
           |  double $y = (double) $b.getFloat($i);
           |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |}
           |${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** a·b in one pass. */
  case class DotProductF32(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<float> arguments, " +
            s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "dot_f32"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var i = 0
      while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      dot
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (n, i, dot) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("dot"))
        s"""
           |int $n = Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |}
           |${ev.value} = $dot;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Sign-random-projection LSH bucket id over an `array<float>` embedding:
    * bit i of the result = (v · h_i) > 0 for `planes` seeded Gaussian
    * hyperplanes. Fuses the whole bucket computation (planes × dim
    * multiply-adds) into one codegen'd loop with the hyperplanes as a flat
    * `double[]` reference object — the per-row bucketing cost at 100 TB is
    * exactly this kernel, and the HOF formulation it replaces paid
    * interpreted lambda dispatch per element per plane.
    *
    * Bit-parity contract with the reference formulation
    * (`Similarity.hyperplaneBucket`): same seeded generation order
    * (plane-major), same left-to-right double accumulation, same strict
    * `> 0.0` threshold.
    */
  case class HyperplaneBucketF32(child: Expression, planes: Int, dim: Int,
      seed: Long) extends UnaryExpression {
    require(planes >= 1 && planes <= 63, s"planes must be in [1,63], got $planes")
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float> argument, got ${other.simpleString}")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "hyperplane_bucket_f32"

    // flat row-major [planes * dim]; generation order matches
    // Similarity.hyperplanes(dim, planes, seed)
    @transient private lazy val hp: Array[Double] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(planes * dim)(rnd.nextGaussian())
    }

    override def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val n = math.min(dim, v.numElements())
      var bucket = 0L
      var i = 0
      while (i < planes) {
        val off = i * dim
        var dot = 0.0
        var j = 0
        while (j < n) { dot += hp(off + j) * v.getFloat(j).toDouble; j += 1 }
        if (dot > 0.0) bucket |= (1L << i)
        i += 1
      }
      bucket
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val hpRef = ctx.addReferenceObj("hyperplanes", hp, "double[]")
      nullSafeCodeGen(ctx, ev, a => {
        val (n, i, j, off, dot, bkt) = (ctx.freshName("n"), ctx.freshName("i"),
          ctx.freshName("j"), ctx.freshName("off"), ctx.freshName("dot"),
          ctx.freshName("bkt"))
        s"""
           |int $n = Math.min($dim, $a.numElements());
           |long $bkt = 0L;
           |for (int $i = 0; $i < $planes; $i++) {
           |  int $off = $i * $dim;
           |  double $dot = 0.0;
           |  for (int $j = 0; $j < $n; $j++) {
           |    $dot += $hpRef[$off + $j] * (double) $a.getFloat($j);
           |  }
           |  if ($dot > 0.0) $bkt |= (1L << $i);
           |}
           |${ev.value} = $bkt;
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Squared L2 distance to the NEAREST centroid (the value the argmin
    * kernel discards): the prototypicality score of Sorscher et al. 2022
    * data pruning — far from every prototype = outlier/noise. Same fused
    * loop, accumulation order and table reference as
    * [[NearestCentroidF32]], so (argmin, mindist) pairs from the two
    * kernels are always consistent, and an oracle can reproduce the
    * value as `least(d_0..d_{k-1})` of identically-ordered sums.
    */
  case class CentroidMinSqDistF32(child: Expression, centroidsFlat: Array[Double],
      dim: Int) extends UnaryExpression {
    require(dim > 0 && centroidsFlat.length % dim == 0,
      s"centroid table length ${centroidsFlat.length} not a multiple of dim $dim")
    private val k = centroidsFlat.length / dim
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float> argument, got ${other.simpleString}")
    }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "centroid_min_sqdist_f32"

    override def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val n = math.min(dim, v.numElements())
      var bestDist = Double.MaxValue
      var c = 0
      while (c < k) {
        val off = c * dim
        var dist = 0.0
        var j = 0
        while (j < n) {
          val d = v.getFloat(j).toDouble - centroidsFlat(off + j)
          dist += d * d; j += 1
        }
        if (dist < bestDist) bestDist = dist
        c += 1
      }
      bestDist
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("centroids", centroidsFlat, "double[]")
      nullSafeCodeGen(ctx, ev, a => {
        val (n, c, j, off, d, dist, bestDist) = (ctx.freshName("n"),
          ctx.freshName("c"), ctx.freshName("j"), ctx.freshName("off"),
          ctx.freshName("d"), ctx.freshName("dist"), ctx.freshName("bestDist"))
        s"""
           |int $n = Math.min($dim, $a.numElements());
           |double $bestDist = Double.MAX_VALUE;
           |for (int $c = 0; $c < $k; $c++) {
           |  int $off = $c * $dim;
           |  double $dist = 0.0;
           |  for (int $j = 0; $j < $n; $j++) {
           |    double $d = (double) $a.getFloat($j) - $cRef[$off + $j];
           |    $dist += $d * $d;
           |  }
           |  if ($dist < $bestDist) $bestDist = $dist;
           |}
           |${ev.value} = $bestDist;
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Two-level (hierarchical) coarse assignment: argmin over k1 SUPER
    * centroids, then argmin over that super cell's k2 SUB centroids —
    * k1 + k2 distance evaluations instead of k1 × k2. This is the
    * assignment shape that keeps scaled-k clustering linear when the
    * cell count tracks the corpus (see SCALING.md's next-decade caveat):
    * with k1 = k2 = √k, assignment cost is O(√k · dim) per vector.
    * Returns the flat cell id `super · k2 + sub`. Same accumulation
    * order and lowest-id tie-break as [[NearestCentroidF32]] at both
    * levels, so an oracle reproduces the id with two nested
    * earliest-minimum CASE chains.
    *
    * `subFlat` is row-major (k1 × k2) × dim: super cell c's sub table is
    * rows [c·k2, (c+1)·k2).
    */
  case class HierCellF32(child: Expression, superFlat: Array[Double],
      subFlat: Array[Double], k2: Int, dim: Int) extends UnaryExpression {
    require(dim > 0 && k2 > 0 && superFlat.length % dim == 0,
      s"super table length ${superFlat.length} not a multiple of dim $dim")
    private val k1 = superFlat.length / dim
    require(subFlat.length == k1 * k2 * dim,
      s"sub table length ${subFlat.length} != k1*k2*dim = ${k1 * k2 * dim}")
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float> argument, got ${other.simpleString}")
    }
    override def dataType: DataType = IntegerType
    override def prettyName: String = "hier_cell_f32"

    override def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val n = math.min(dim, v.numElements())
      def argmin(flat: Array[Double], from: Int, count: Int): Int = {
        var best = 0
        var bestDist = Double.MaxValue
        var c = 0
        while (c < count) {
          val off = (from + c) * dim
          var dist = 0.0
          var j = 0
          while (j < n) {
            val d = v.getFloat(j).toDouble - flat(off + j)
            dist += d * d; j += 1
          }
          if (dist < bestDist) { bestDist = dist; best = c }
          c += 1
        }
        best
      }
      val s = argmin(superFlat, 0, k1)
      s * k2 + argmin(subFlat, s * k2, k2)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val supRef = ctx.addReferenceObj("superCentroids", superFlat, "double[]")
      val subRef = ctx.addReferenceObj("subCentroids", subFlat, "double[]")
      nullSafeCodeGen(ctx, ev, a => {
        val (n, c, j, off, d, dist, best, bestDist, s) = (ctx.freshName("n"),
          ctx.freshName("c"), ctx.freshName("j"), ctx.freshName("off"),
          ctx.freshName("d"), ctx.freshName("dist"), ctx.freshName("best"),
          ctx.freshName("bestDist"), ctx.freshName("s"))
        s"""
           |int $n = Math.min($dim, $a.numElements());
           |int $best = 0;
           |double $bestDist = Double.MAX_VALUE;
           |for (int $c = 0; $c < $k1; $c++) {
           |  int $off = $c * $dim;
           |  double $dist = 0.0;
           |  for (int $j = 0; $j < $n; $j++) {
           |    double $d = (double) $a.getFloat($j) - $supRef[$off + $j];
           |    $dist += $d * $d;
           |  }
           |  if ($dist < $bestDist) { $bestDist = $dist; $best = $c; }
           |}
           |int $s = $best;
           |$best = 0;
           |$bestDist = Double.MAX_VALUE;
           |for (int $c = 0; $c < $k2; $c++) {
           |  int $off = ($s * $k2 + $c) * $dim;
           |  double $dist = 0.0;
           |  for (int $j = 0; $j < $n; $j++) {
           |    double $d = (double) $a.getFloat($j) - $subRef[$off + $j];
           |    $dist += $d * $d;
           |  }
           |  if ($dist < $bestDist) { $bestDist = $dist; $best = $c; }
           |}
           |${ev.value} = $s * $k2 + $best;
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** IVF coarse-quantizer assignment: index (argmin) of the nearest
    * centroid by squared L2 distance, over an `array<float>` embedding.
    * The centroid table (k × dim doubles, flat row-major) is a plan-time
    * constant referenced from generated code — one fused loop per row, no
    * per-row allocation. Ties break to the LOWEST centroid id
    * (deterministic across engines and partitionings).
    */
  case class NearestCentroidF32(child: Expression, centroidsFlat: Array[Double],
      dim: Int) extends UnaryExpression {
    require(dim > 0 && centroidsFlat.length % dim == 0,
      s"centroid table length ${centroidsFlat.length} not a multiple of dim $dim")
    private val k = centroidsFlat.length / dim
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float> argument, got ${other.simpleString}")
    }
    override def dataType: DataType = IntegerType
    override def prettyName: String = "nearest_centroid_f32"

    override def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val n = math.min(dim, v.numElements())
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < k) {
        val off = c * dim
        var dist = 0.0
        var j = 0
        while (j < n) {
          val d = v.getFloat(j).toDouble - centroidsFlat(off + j)
          dist += d * d; j += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      best
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("centroids", centroidsFlat, "double[]")
      nullSafeCodeGen(ctx, ev, a => {
        val (n, c, j, off, d, dist, best, bestDist) = (ctx.freshName("n"),
          ctx.freshName("c"), ctx.freshName("j"), ctx.freshName("off"),
          ctx.freshName("d"), ctx.freshName("dist"), ctx.freshName("best"),
          ctx.freshName("bestDist"))
        s"""
           |int $n = Math.min($dim, $a.numElements());
           |int $best = 0;
           |double $bestDist = Double.MAX_VALUE;
           |for (int $c = 0; $c < $k; $c++) {
           |  int $off = $c * $dim;
           |  double $dist = 0.0;
           |  for (int $j = 0; $j < $n; $j++) {
           |    double $d = (double) $a.getFloat($j) - $cRef[$off + $j];
           |    $dist += $d * $d;
           |  }
           |  if ($dist < $bestDist) { $bestDist = $dist; $best = $c; }
           |}
           |${ev.value} = $best;
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Int8 scalar-quantization audit over an `array<float>` embedding in
    * ONE fused pass: min/max scan, affine codes, code stats, and the max
    * reconstruction error, returned as a struct — no intermediate arrays
    * materialize at all (the HOF formulation allocates the cast copy, the
    * codes array, and the error array per row). At 100 TB the quantization
    * projection is exactly this loop.
    *
    * Bit-parity contract with the HOF formulation in
    * [[graft.ops.Quantize]] and the DuckDB oracle: same double-precision
    * operation order, and round-half-up on the (always non-negative)
    * scaled value implemented exactly — `floor`-based tricks drift one ulp
    * on values just below .5.
    */
  case class QuantizeAuditInt8F32(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float> argument, got ${other.simpleString}")
    }
    override def dataType: DataType = QuantizeAuditInt8F32.schema
    override def prettyName: String = "quantize_audit_int8_f32"

    override def nullSafeEval(a: Any): Any =
      QuantizeKernels.audit(a.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"""${ev.value} = graft.functions.QuantizeKernels.audit($a);""")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object QuantizeAuditInt8F32 {
    import org.apache.spark.sql.types.{StructField, StructType}
    val schema: StructType = StructType(Seq(
      StructField("n_dims", LongType, nullable = false),
      StructField("qmin", DoubleType, nullable = true),
      StructField("qmax", DoubleType, nullable = true),
      StructField("c_sum", LongType, nullable = true),
      StructField("c_min", LongType, nullable = true),
      StructField("c_max", LongType, nullable = true),
      StructField("max_abs_err", DoubleType, nullable = true)))
  }

  /** ‖v‖₂ in one pass. */
  case class L2NormF32(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float> argument, got ${other.simpleString}")
    }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "l2_norm_f32"

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var s = 0.0; var i = 0
      while (i < n) { val xi = x.getFloat(i).toDouble; s += xi * xi; i += 1 }
      math.sqrt(s)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val (n, i, s, xi) = (ctx.freshName("n"), ctx.freshName("i"),
          ctx.freshName("s"), ctx.freshName("xi"))
        s"""
           |int $n = $a.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xi = (double) $a.getFloat($i);
           |  $s += $xi * $xi;
           |}
           |${ev.value} = Math.sqrt($s);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Fused residual product-quantization encoder: codes quantize the IVF
    * residual x − c(x) (Jégou et al. 2011 §III) — for each subspace `i`,
    * the argmin over `kSub` codebook entries of the residual slice's
    * squared L2, all in ONE codegen'd pass per row with no residual array
    * materialized. Residual PQ is the recall-correct composition with a
    * coarse quantizer (flat PQ wastes code entropy re-describing the
    * centroid offset). Arithmetic contract (mirrored by the SQL oracle):
    * every term is `((double)x_j − coarse_j) − cb_j`, squared-L2
    * accumulated left-to-right, strictly-smaller argmin update
    * (earliest-minimum tie-break).
    */
  case class PqResidualCodesF32(left: Expression, right: Expression,
      coarseFlat: Array[Double], codebooksFlat: Array[Double],
      m: Int, kSub: Int, dSub: Int) extends BinaryExpression {
    require(coarseFlat.length % (m * dSub) == 0,
      s"coarse table length ${coarseFlat.length} not a multiple of dim ${m * dSub}")
    require(codebooksFlat.length == m * kSub * dSub,
      s"codebook table length ${codebooksFlat.length} != $m*$kSub*$dSub")
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(FloatType, _), IntegerType) =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, int) arguments, " +
            s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
      }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "pq_residual_codes_f32"

    override def nullSafeEval(a: Any, b: Any): Any =
      QuantizeKernels.pqResidualCodes(a.asInstanceOf[ArrayData],
        b.asInstanceOf[Int], coarseFlat, codebooksFlat, m, kSub, dSub)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val coarseRef = ctx.addReferenceObj("coarse", coarseFlat, "double[]")
      val cbRef = ctx.addReferenceObj("codebooks", codebooksFlat, "double[]")
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"""${ev.value} = graft.functions.QuantizeKernels.pqResidualCodes(
           |  $a, $b, $coarseRef, $cbRef, $m, $kSub, $dSub);""".stripMargin)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }
}

/** Static loop body for [[VectorExpressions.QuantizeAuditInt8F32]] — a
  * top-level object so generated code reaches it as a plain static call
  * (`graft.functions.QuantizeKernels.audit(arr)`), keeping the expression
  * inside the whole-stage-codegen span with zero per-element dispatch.
  */
object QuantizeKernels {

  /** Exact round-half-up for non-negative d (parity with Spark round()
    * HALF_UP and DuckDB round() half-away-from-zero on positives):
    * `d - floor(d)` is exact for d < 2^52, so the .5 comparison cannot be
    * perturbed the way `floor(d + 0.5)` is.
    */
  private def roundHalfUpNonNeg(d: Double): Long = {
    val f = d.toLong
    if (d - f >= 0.5) f + 1L else f
  }

  /** One fused pass: min/max, affine int8 codes, code stats, max
    * reconstruction error. Shared by interpreted eval and generated code.
    */
  def audit(v: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = v.numElements()
    if (n == 0) // matches the HOF formulation: aggregate(empty)=0, min/max null
      return org.apache.spark.sql.catalyst.InternalRow(
        0L, null, null, 0L, null, null, null)
    // min/max under SPARK's ordering (NaN sorts greatest): array_min skips
    // NaN unless all elements are NaN, array_max is NaN if ANY element is —
    // the HOF formulation sees exactly this, so the kernel must too
    var qmin = v.getFloat(0).toDouble
    var qmax = qmin
    var i = 1
    while (i < n) {
      val x = v.getFloat(i).toDouble
      if (x < qmin || qmin.isNaN) qmin = x
      if (x > qmax || x.isNaN) qmax = x
      i += 1
    }
    val span = qmax - qmin
    val scale = span / 255.0
    var cSum = 0L
    var cMin = Long.MaxValue
    var cMax = Long.MinValue
    var maxErr = 0.0
    i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      val c = if (span == 0.0) 0L else roundHalfUpNonNeg((x - qmin) / scale)
      cSum += c
      if (c < cMin) cMin = c
      if (c > cMax) cMax = c
      if (span != 0.0) {
        val err = math.abs(qmin + c.toDouble * scale - x)
        // array_max semantics again: NaN (from a NaN element) wins and sticks
        if (err > maxErr || err.isNaN) maxErr = err
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      n.toLong, qmin, qmax, cSum, cMin, cMax, maxErr)
  }

  /** Static loop body for [[VectorExpressions.PqResidualCodesF32]] —
    * residual PQ codes in one pass. Per subspace `i` and codebook entry
    * `c`: dist = Σ_j (((double)v[i·dSub+j] − coarse[cid·dim + i·dSub+j])
    * − cb[((i·kSub)+c)·dSub+j])², accumulated left-to-right; argmin with
    * strictly-smaller update. Elements past the vector's length contribute
    * nothing (ragged clamp, same contract as NearestCentroidF32).
    */
  def pqResidualCodes(v: ArrayData, cid: Int, coarse: Array[Double],
      codebooksFlat: Array[Double], m: Int, kSub: Int,
      dSub: Int): ArrayData = {
    val dim = m * dSub
    val n = v.numElements()
    val codes = new Array[Long](m)
    var i = 0
    while (i < m) {
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < kSub) {
        val cbOff = (i * kSub + c) * dSub
        var dist = 0.0
        var j = 0
        while (j < dSub) {
          val idx = i * dSub + j
          if (idx < n) {
            val r = v.getFloat(idx).toDouble - coarse(cid * dim + idx)
            val d = r - codebooksFlat(cbOff + j)
            dist += d * d
          }
          j += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      codes(i) = best.toLong
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }
}

/** Column-level API + SQL registration for the native vector kernels. */
object VectorFunctions {
  import VectorExpressions._

  private def asColumn(e: Expression): Column = GraftExpressionBridge.column(e)

  def cosineF32(a: Column, b: Column): Column =
    asColumn(CosineSimilarityF32(expression(a), expression(b)))
  def dotF32(a: Column, b: Column): Column =
    asColumn(DotProductF32(expression(a), expression(b)))
  def l2NormF32(v: Column): Column = asColumn(L2NormF32(expression(v)))
  def hyperplaneBucketF32(v: Column, planes: Int, dim: Int = 64,
      seed: Long = 42L): Column =
    asColumn(HyperplaneBucketF32(expression(v), planes, dim, seed))
  def nearestCentroidF32(v: Column, centroidsFlat: Array[Double], dim: Int): Column =
    asColumn(NearestCentroidF32(expression(v), centroidsFlat, dim))
  def centroidMinSqDistF32(v: Column, centroidsFlat: Array[Double], dim: Int): Column =
    asColumn(CentroidMinSqDistF32(expression(v), centroidsFlat, dim))
  def hierCellF32(v: Column, superFlat: Array[Double], subFlat: Array[Double],
      k2: Int, dim: Int): Column =
    asColumn(HierCellF32(expression(v), superFlat, subFlat, k2, dim))
  def quantizeAuditInt8F32(v: Column): Column =
    asColumn(QuantizeAuditInt8F32(expression(v)))
  def pqResidualCodesF32(v: Column, centroidId: Column,
      coarseFlat: Array[Double], codebooks: Array[Array[Double]],
      dSub: Int): Column = {
    val kSub = codebooks(0).length / dSub
    asColumn(PqResidualCodesF32(expression(v), expression(centroidId),
      coarseFlat, codebooks.flatten, codebooks.length, kSub, dSub))
  }

  private def expression(c: Column): Expression = GraftExpressionBridge.expression(c)

  /** Make the kernels available to SQL (`SELECT cosine_f32(a, b) ...`). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_f32",
      es => CosineSimilarityF32(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("dot_f32",
      es => DotProductF32(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("l2_norm_f32",
      es => L2NormF32(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("hyperplane_bucket_f32",
      es => HyperplaneBucketF32(es(0),
        graft.GraftExtensions.litInt(es(1), "planes"),
        graft.GraftExtensions.litInt(es(2), "dim"),
        if (es.size > 3) graft.GraftExtensions.litLong(es(3), "seed") else 42L),
      "scala_udf")
    reg.createOrReplaceTempFunction("morton_z",
      es => graft.GraftExtensions.mortonZExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("quantize_audit_int8_f32",
      es => QuantizeAuditInt8F32(es.head), "scala_udf")
  }
}
