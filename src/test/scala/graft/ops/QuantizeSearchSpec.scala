package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(0.0f, 1.0f, 2.0f, 3.0f)),       // uniform ramp
    (2L, Array(-1.0f, 0.0f, 1.0f)),            // negative min
    (3L, Array(0.5f, 0.5f, 0.5f)),             // constant (span 0)
    (4L, Array(0.0f, 255.0f)),                 // scale exactly 1
    (5L, Array(0.0f, Float.NaN, 2.0f)),        // NaN element (max = NaN)
    (6L, Array(Float.NaN, Float.NaN))          // all-NaN
  ).toDF("vec_id", "embedding")

  test("codes span [0,255], endpoints exact, constant vector all-zero") {
    val audit = Quantize.auditInt8(vecs, "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(audit(1L).getAs[Long]("c_min") == 0L)
    assert(audit(1L).getAs[Long]("c_max") == 255L)
    assert(audit(3L).getAs[Long]("c_sum") == 0L)
    assert(audit(3L).getAs[Double]("max_abs_err") == 0.0)
    assert(audit(4L).getAs[Long]("c_sum") == 255L)
    assert(audit(4L).getAs[Double]("max_abs_err") == 0.0)
  }

  test("reconstruction error bounded by half a quantization step") {
    val bad = Quantize.quantizeInt8(vecs, "embedding")
      .select(col("vec_id"), col("qmin"), col("qmax"), col("codes"),
        col("__v"))
      .withColumn("step",
        (col("qmax") - col("qmin")) / lit(255.0))
      .withColumn("errs", zip_with(col("codes"), col("__v"),
        (c, x) => abs(col("qmin") + c.cast("double") *
          (col("qmax") - col("qmin")) / lit(255.0) - x)))
      .where(exists(col("errs"), e => e > col("step") * lit(0.5) + lit(1e-12)))
    assert(bad.count() == 0)
  }

  test("native kernel and HOF formulation are bit-identical") {
    // NaN-tolerant bit comparison (NaN != NaN under ==)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map {
        case d: Double => java.lang.Double.doubleToLongBits(d)
        case x => x
      }).toSet
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    assert(rows(Quantize.auditInt8(emb, "vec_id", "embedding")) ==
      rows(Quantize.auditInt8Hof(emb, "vec_id", "embedding")))
    // fixtures cover span-0, exact-endpoint, NaN-element and all-NaN edges
    assert(rows(Quantize.auditInt8(vecs, "vec_id", "embedding")) ==
      rows(Quantize.auditInt8Hof(vecs, "vec_id", "embedding")))
  }

  test("real embeddings: every code in range, error below half step") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).limit(50)
    val audit = Quantize.auditInt8(emb, "vec_id", "embedding").collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      assert(r.getAs[Long]("c_min") >= 0L && r.getAs[Long]("c_max") <= 255L)
      val step = (r.getAs[Double]("qmax") - r.getAs[Double]("qmin")) / 255.0
      assert(r.getAs[Double]("max_abs_err") <= step * 0.5 + 1e-12)
    }
  }

  test("PQ encode: codes match a driver-side argmin; pack/unpack roundtrip") {
    val (m, kSub, dSub) = (4, 8, 2)
    val cbs = Quantize.pqCodebooks(m, kSub, dSub)
    val data = Seq(
      (1L, Array(0.1f, -0.3f, 1.2f, 0.4f, -2.0f, 0.0f, 0.7f, 0.9f)),
      (2L, Array(-1.1f, 0.3f, -0.2f, 2.4f, 1.0f, -0.5f, 0.2f, -0.9f)))
      .toDF("vec_id", "embedding")
    def expectedCodes(v: Array[Float]): Seq[Long] =
      (0 until m).map { i =>
        val sub = v.slice(i * dSub, (i + 1) * dSub).map(_.toDouble)
        (0 until kSub).minBy { c =>
          // strictly-smaller update = earliest-minimum tie-break (minBy
          // keeps the first minimum, matching the kernel contract)
          sub.zipWithIndex.map { case (x, j) =>
            val d = x - cbs(i)(c * dSub + j); d * d
          }.sum
        }.toLong
      }
    val got = Quantize.pqEncode(data, "vec_id", "embedding", cbs, dSub)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](r.fieldIndex("pq_codes"))).toMap
    Seq(1L, 2L).foreach { id =>
      val v = if (id == 1L) Array(0.1f, -0.3f, 1.2f, 0.4f, -2.0f, 0.0f, 0.7f, 0.9f)
              else Array(-1.1f, 0.3f, -0.2f, 2.4f, 1.0f, -0.5f, 0.2f, -0.9f)
      assert(got(id) == expectedCodes(v), s"vec $id codes diverge")
      assert(got(id).forall(c => c >= 0 && c < kSub))
    }
    // packed word decodes back to the code sequence
    val bits = 3 // kSub = 8
    val packed = Quantize.pqEncode(data, "vec_id", "embedding", cbs, dSub)
      .select(col("vec_id"), Quantize.pqPackWord(col("pq_codes"), m, bits).as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(1L, 2L).foreach { id =>
      val unpacked = (0 until m).map(i => (packed(id) >> (i * bits)) & ((1L << bits) - 1))
      assert(unpacked == got(id), s"vec $id pack/unpack mismatch")
    }
  }

  test("PQ ADC: top-k scores equal driver-side table lookups; ranking sane") {
    val (m, kSub, dSub) = (8, 16, 8)
    val cbs = Quantize.pqCodebooks(m, kSub, dSub)
    val query = { val r = new scala.util.Random(99); Seq.fill(64)(r.nextGaussian()) }
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .where(col("embedding").isNotNull && size(col("embedding")) === 64 &&
        !exists(col("embedding"), _.isNull))
    val top = Quantize.pqAdcTopK(emb, "vec_id", "embedding", cbs, dSub, query, k = 5)
      .collect()
    assert(top.length == 5)
    // scores ascend and equal the hand-computed table sum for each row
    val tables = Array.tabulate(m, kSub) { (i, c) =>
      (0 until dSub).map { j =>
        val d = query(i * dSub + j) - cbs(i)(c * dSub + j); d * d
      }.foldLeft(0.0)(_ + _)
    }
    val codesOf = Quantize.pqEncode(emb, "vec_id", "embedding", cbs, dSub)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](r.fieldIndex("pq_codes"))).toMap
    var prev = Double.NegativeInfinity
    top.foreach { r =>
      val id = r.getLong(0)
      val dist = r.getAs[Double]("adc_dist")
      assert(dist >= prev); prev = dist
      val expected = codesOf(id).zipWithIndex
        .map { case (c, i) => tables(i)(c.toInt) }
        .foldLeft(0.0)(_ + _)
      assert(dist == expected, s"vec $id: adc $dist != table sum $expected")
    }
  }

  test("IVF-PQ: results confined to the probed lists; probe set matches driver argmin") {
    val (m, kSub, dSub, dim, coarseK, nprobe) = (8, 16, 8, 64, 8, 2)
    // scale the seeded tables to the unit-norm fixture's coordinate RMS
    // (1/√dim) or every argmin collapses onto the smallest-norm centroid
    val cbs = Quantize.pqCodebooks(m, kSub, dSub, scale = 0.125)
    val coarse = Similarity.IvfIndex(
      Similarity.fixedCentroids(coarseK, dim).map(_ / 8.0), dim)
    val query = { val r = new scala.util.Random(17); Seq.fill(dim)(r.nextGaussian() / 8.0) }
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .where(col("embedding").isNotNull && size(col("embedding")) === dim &&
        !exists(col("embedding"), _.isNull))
    val probeIds = coarse.probes(query, nprobe).toSet
    assert(probeIds.size == nprobe)
    val top = Quantize.ivfPqTopK(emb, "vec_id", "embedding", coarse, cbs,
      dSub, query, k = 10, nprobe = nprobe).collect()
    assert(top.nonEmpty, "probed lists were empty — coarse scaling regressed")
    top.foreach { r =>
      assert(probeIds.contains(r.getAs[Long]("centroid_id").toInt),
        s"vec ${r.getLong(0)} scored outside the probed lists")
    }
    // every returned id must actually coarse-assign into a probed list
    val assigns = Quantize.ivfPqTopK(emb, "vec_id", "embedding", coarse, cbs,
      dSub, query, k = Int.MaxValue, nprobe = coarseK) // all lists
      .select("vec_id", "centroid_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    top.foreach(r =>
      assert(assigns(r.getLong(0)) == r.getAs[Long]("centroid_id")))
  }

  test("residual PQ kernel: codes match a driver-side residual argmin") {
    val (m, kSub, dSub, dim) = (4, 8, 2, 8)
    val cbs = Quantize.pqCodebooks(m, kSub, dSub, scale = 0.3)
    // coarse offsets larger than the codebook spread so subtracting the
    // centroid provably moves at least one subspace argmin vs flat PQ
    val coarseFlat = Similarity.fixedCentroids(3, dim, seed = 21L).map(_ * 3.0)
    val vecs = Seq(
      (1L, Array(0.1f, -0.3f, 1.2f, 0.4f, -2.0f, 0.0f, 0.7f, 0.9f), 0),
      (2L, Array(-1.1f, 0.3f, -0.2f, 2.4f, 1.0f, -0.5f, 0.2f, -0.9f), 2))
    val df = vecs.toDF("vec_id", "embedding", "centroid_id")
    val got = df.select(col("vec_id"),
        graft.functions.VectorFunctions.pqResidualCodesF32(
          col("embedding"), col("centroid_id"), coarseFlat, cbs, dSub).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    vecs.foreach { case (id, v, cid) =>
      val expected = (0 until m).map { i =>
        (0 until kSub).minBy { c =>
          (0 until dSub).map { j =>
            val idx = i * dSub + j
            val r = v(idx).toDouble - coarseFlat(cid * dim + idx)
            val d = r - cbs(i)(c * dSub + j)
            d * d
          }.sum
        }.toLong
      }
      assert(got(id) == expected, s"vec $id residual codes diverge")
    }
    // residual codes must differ from flat codes somewhere (the residual
    // actually changed what gets quantized) for a non-zero centroid
    val flat = Quantize.pqEncode(df, "vec_id", "embedding", cbs, dSub)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Long](r.fieldIndex("pq_codes"))).toMap
    assert(got(2L) != flat(2L), "residual encoding degenerated to flat")
  }
}

class KeywordSearchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "Spark join the window world"),
    (2L, "spark spark spark join window"),     // repeats collapse in index
    (3L, "join window but no engine word"),
    (4L, "SPARK and JOIN only"),
    (5L, "")).toDF("doc_id", "text")

  test("inverted index holds distinct case-folded (doc, token) pairs") {
    val idx = TextAnalysis.invertedIndex(docs, "doc_id")
    val d2 = idx.where($"doc_id" === 2L).collect().map(_.getString(1)).sorted
    assert(d2.toSeq == Seq("join", "spark", "window"))
    assert(idx.where($"doc_id" === 5L).count() == 0)
  }

  test("conjunctive search returns exactly the docs containing all terms") {
    val idx = TextAnalysis.invertedIndex(docs, "doc_id")
    val hits = TextAnalysis.searchAll(idx, Seq("Spark", "JOIN", "window"))
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 2L))
    val single = TextAnalysis.searchAll(idx, Seq("engine"))
      .collect().map(_.getLong(0)).toSet
    assert(single == Set(3L))
  }

  test("bm25: rarer terms and higher tf outrank; unmatched docs absent") {
    val corpus = Seq(
      (1L, "spark spark spark common common"),   // high tf of rare term
      (2L, "spark common common common common"), // low tf of rare term
      (3L, "common common common common common"),// only the ubiquitous term
      (4L, "nothing relevant here at all")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Search(corpus, "doc_id", Seq("spark", "common"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val ranked = out.map(_._1).toSeq
    assert(!ranked.contains(4L), "doc with no query term must not score")
    // doc 1 (3x rare 'spark') must beat doc 2 (1x) which beats doc 3 (none)
    assert(ranked.indexOf(1L) < ranked.indexOf(2L))
    assert(ranked.indexOf(2L) < ranked.indexOf(3L))
    val scores = out.toMap
    assert(scores(1L) > scores(2L) && scores(2L) > scores(3L))
  }

  test("bucketed index probe prunes to the query terms' buckets") {
    // the 100-TB layout: postings written ONCE bucketed by token; a probe
    // then reads only the buckets its terms hash to — scan cost follows
    // the query, not the corpus
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    Bucketing.writeBucketed(
      TextAnalysis.invertedIndex(corpus, "doc_id"), "t_postings", "token", 8)
    // the planner auto-disables bucketed scans when no join/agg needs the
    // bucket distribution — which also forfeits bucket PRUNING; a probe
    // workload wants the pruning, so pin the bucketed scan on
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val probe = TextAnalysis.searchAll(spark.table("t_postings"),
        Seq("spark", "join"))
      val p = probe.queryExecution.executedPlan.toString
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(p)
      assert(m.isDefined, s"no bucket pruning in probe plan:\n$p")
      assert(m.get.group(1).toInt < m.get.group(2).toInt,
        s"probe read every bucket:\n$p")
      // result parity with the unbucketed formulation
      val expected = TextAnalysis.searchAll(
        TextAnalysis.invertedIndex(corpus, "doc_id"), Seq("spark", "join"))
        .collect().map(_.getLong(0)).toSet
      assert(probe.collect().map(_.getLong(0)).toSet == expected)
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS t_postings")
    }
  }
}
