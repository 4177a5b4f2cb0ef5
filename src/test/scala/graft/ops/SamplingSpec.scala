package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 2000L)
    .map(i => (i, if (i % 5 == 0) "en" else if (i % 5 == 1) "de" else "fr",
      s"src${i % 3}", 50L + i % 400))
    .toDF("doc_id", "lang", "source", "n_chars")

  test("hashBucket: deterministic, in range, near-uniform on sequential keys") {
    val buckets = docs.select(Sampling.hashBucket($"doc_id").as("b"))
      .collect().map(_.getLong(0))
    assert(buckets.forall(b => b >= 0 && b < 10000))
    // rerun selects identical buckets (stability under retry/backfill)
    val again = docs.select(Sampling.hashBucket($"doc_id").as("b"))
      .collect().map(_.getLong(0))
    assert(buckets.sameElements(again))
  }

  test("ringThreshold: clamps to 1 when n > quota * 2^32 (multi-billion-row domain)") {
    // quota 1 against a 5e9-row domain: floor(1 * 2^32 / 5e9) = 0 — the
    // unclamped threshold would silently empty the domain. The clamp keeps
    // an expected n/2^32 >= 1 row.
    val out = Seq((1L, 5000000000L), (1L, 100L), (5000000000L, 100L))
      .toDF("quota", "n")
      .select(Sampling.ringThreshold($"quota", $"n").as("thr"))
      .collect().map(_.getLong(0))
    assert(out(0) == 1L, s"dropout cliff: threshold ${out(0)} for n=5e9, quota=1")
    assert(out(1) == 42949672L) // floor(2^32 / 100)
    assert(out(2) == Sampling.HashRing) // upper clamp: quota >= n
  }

  test("bernoulliSample: rate within binomial tolerance, stable membership") {
    val kept = Sampling.bernoulliSample(docs, "doc_id", perMyriad = 2000)
    val n = kept.count()
    // 20% of 2000 = 400 expected; 4 sigma ≈ 72
    assert(n > 320 && n < 480, s"rate off: $n/2000 at 20%")
    // sample of a sample at the same rate is the same set (hash, not RNG)
    assert(Sampling.bernoulliSample(kept, "doc_id", 2000).count() == n)
  }

  test("stratifiedSample: per-stratum rates honored") {
    val kept = Sampling.stratifiedSample(docs, "doc_id", "lang",
      rates = Map("en" -> 1000), defaultPerMyriad = 9000)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en: 10% of 400 = 40 ± 4σ≈24; de/fr: 90% of their strata
    assert(byLang("en") < 70, s"en oversampled: ${byLang("en")}")
    assert(byLang("de") > 300 && byLang("fr") > 900)
  }

  test("quotaCap: at most n per group, longest kept, deterministic cut") {
    val capped = Sampling.quotaCap(docs, "source",
      Seq($"n_chars".desc, $"doc_id"), n = 10)
    val counts = capped.groupBy("source").count().collect().map(_.getLong(1))
    assert(counts.forall(_ == 10))
    // kept rows dominate dropped rows under the ordering
    val minKept = capped.agg(min("n_chars")).head().getLong(0)
    assert(minKept >= 440, s"quota kept a short doc: min n_chars $minKept")
  }

  test("quotaCap plans WindowGroupLimit (rank pushed below the exchange)") {
    val plan = Sampling.quotaCap(docs, "source",
      Seq($"n_chars".desc, $"doc_id"), n = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("pow2Bucket: binary-digit bucket edges") {
    val got = Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L).toDF("n")
      .select(Sampling.pow2Bucket($"n").as("b")).collect().map(_.getInt(0))
    assert(got.sameElements(Array(1, 1, 2, 2, 3, 3, 4, 10, 11)))
  }

  test("packSequences: running-sum bins, offsets, bucket independence") {
    // one bucket (ids all ≡ 0 mod 1): lengths desc → 60, 50, 40, 30
    val df = Seq((10L, 60L), (11L, 50L), (12L, 40L), (13L, 30L))
      .toDF("doc_id", "n_tokens")
    val out = Sampling.packSequences(df, "doc_id", "n_tokens",
        budget = 100L, buckets = 1)
      .select("doc_id", "pack_bin", "bin_offset")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // starts: 60→0, 50→60, 40→110, 30→150
    assert(out(10L) == ((0L, 0L)))
    assert(out(11L) == ((0L, 60L)))
    assert(out(12L) == ((1L, 10L)))
    assert(out(13L) == ((1L, 50L)))
    // two buckets: odd/even ids pack independently, each starting at bin 0
    val out2 = Sampling.packSequences(df, "doc_id", "n_tokens",
        budget = 100L, buckets = 2)
      .select("doc_id", "pack_bucket", "pack_bin", "bin_offset")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out2(10L) == ((0L, 0L, 0L)) && out2(12L) == ((0L, 0L, 60L)))
    assert(out2(11L) == ((1L, 0L, 0L)) && out2(13L) == ((1L, 0L, 50L)))
  }

  test("splitAssign: partitioned, exhaustive, key-stable, near-target rates") {
    val docs = spark.range(0, 10000).toDF("doc_id")
    val splits = Seq("train" -> 8000, "val" -> 1000, "test" -> 1000)
    val out = Sampling.splitAssign(docs, "doc_id", splits)
    val byLabel = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel.values.sum == 10000L)
    assert(math.abs(byLabel("train") - 8000L) < 400, byLabel.toString)
    // stability: a grown corpus never reassigns an existing key
    val grown = Sampling.splitAssign(spark.range(0, 20000).toDF("doc_id"),
      "doc_id", splits)
    val joined = out.withColumnRenamed("split", "s1")
      .join(grown.withColumnRenamed("split", "s2"), "doc_id")
    assert(joined.where(col("s1") =!= col("s2")).count() == 0)
    // weights must sum to 10000
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(docs, "doc_id", Seq("a" -> 5000, "b" -> 4000))
    }
  }

  test("negativePairs: k per anchor, in range, never the anchor itself") {
    val docs = spark.range(0, 50).toDF("doc_id")
    val pairs = Sampling.negativePairs(docs, "doc_id", n = 50L, k = 3)
    assert(pairs.count() == 150)
    assert(pairs.where(col("neg_id") === col("doc_id")).count() == 0)
    assert(pairs.where(col("neg_id") < 0 || col("neg_id") >= 50).count() == 0)
    // deterministic: two runs identical
    val again = Sampling.negativePairs(docs, "doc_id", n = 50L, k = 3)
    assert(pairs.exceptAll(again).count() == 0)
  }

  test("buildVocab: min-count floor, dense freq-ordered ids") {
    import spark.implicits._
    val docs = Seq.fill(6)("alpha beta").zipWithIndex
      .map { case (t, i) => (i.toLong, if (i < 3) t + " gamma" else t) }
      .toDF("doc_id", "text")
    val v = TextAnalysis.buildVocab(docs, minCount = 3L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // alpha=6, beta=6, gamma=3; ids: (6,alpha)=0, (6,beta)=1, (3,gamma)=2
    assert(v == Map("alpha" -> ((6L, 0L)), "beta" -> ((6L, 1L)),
      "gamma" -> ((3L, 2L))))
  }

  test("mixtureSelect: achieved counts track targets, whitelist drops unnamed domains") {
    // corpus: en 400, de 400, fr 1200; target 50/50 en/de at budget 400
    val out = Sampling.mixtureSelect(docs, "doc_id", "lang",
      targets = Seq("en" -> 5000, "de" -> 5000), budget = 400L)
    val byLang = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("fr")) // not in the mixture → dropped
    // needed 200 of 400 each → rate 5000 pm; binomial 4-sigma ≈ 40
    assert(byLang("en") > 160 && byLang("en") < 240, s"en: ${byLang("en")}")
    assert(byLang("de") > 160 && byLang("de") < 240, s"de: ${byLang("de")}")
  }

  test("mixtureSelect: under-supplied domain is taken whole (rate cap)") {
    // en needs 5000pm*3000/10000 = 1500 rows but only 400 exist → all kept
    val out = Sampling.mixtureSelect(docs, "doc_id", "lang",
      targets = Seq("en" -> 5000, "fr" -> 5000), budget = 3000L)
    val byLang = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") === 400L)
    // fr has 1200 for a 1500 quota → also capped whole
    assert(byLang("fr") === 1200L)
  }

  test("mixtureSelect: a zero-row quota fails loudly instead of silently emptying the domain") {
    // en at 1 permyriad of a 5000-row budget → quota floor(1*5000/10000)=0:
    // before the guard this SELECTED NOTHING for a domain the mixture names
    val ex = intercept[IllegalArgumentException] {
      Sampling.mixtureSelect(docs, "doc_id", "lang",
        targets = Seq("en" -> 1, "de" -> 9999), budget = 5000L)
    }
    assert(ex.getMessage.contains("zero-row quota"))
  }

  test("mixtureSelect: selection is key-stable under repartitioning") {
    val a = Sampling.mixtureSelect(docs, "doc_id", "lang",
      targets = Seq("en" -> 3000, "de" -> 7000), budget = 300L)
      .select("doc_id").as[Long].collect().sorted
    val b = Sampling.mixtureSelect(docs.repartition(11), "doc_id", "lang",
      targets = Seq("en" -> 3000, "de" -> 7000), budget = 300L)
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b))
  }

  test("temperatureMixture: alpha=0.5 upweights the tail relative to proportional") {
    // corpus: en 400, de 400, fr 1200 — under sqrt weights fr's share
    // drops from 1200/2000 = 60% to sqrt(1200)/(2*sqrt(400)+sqrt(1200))
    // ≈ 46%, and the en/de tail rises accordingly
    val prop = Sampling.temperatureMixture(docs, "doc_id", "lang",
      alpha = 1.0, budget = 600L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val damp = Sampling.temperatureMixture(docs, "doc_id", "lang",
      alpha = 0.5, budget = 600L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every domain present under both (the >= 1-row guarantee at work)
    assert(prop.keySet === Set("en", "de", "fr") && damp.keySet === prop.keySet)
    val frShareProp = prop("fr").toDouble / prop.values.sum
    val frShareDamp = damp("fr").toDouble / damp.values.sum
    assert(frShareDamp < frShareProp,
      s"sqrt damping did not shrink the dominant share: $frShareDamp vs $frShareProp")
    // binomial sanity on the damped expectation (~46% of ~600 ± 4σ)
    assert(damp("fr") > 200 && damp("fr") < 360, s"fr: ${damp("fr")}")
  }

  test("temperatureMixture: tail domain never empties; selection key-stable; bad alpha rejected") {
    // a 3-row micro-domain against a 2000-row giant: its derived quota
    // floors to zero and the [1, n] clamp must keep an expected row
    val skewed = docs.withColumn("lang", lit("big"))
      .unionByName(Seq((90001L, "tiny", "srcx", 60L), (90002L, "tiny", "srcx", 61L),
        (90003L, "tiny", "srcx", 62L)).toDF("doc_id", "lang", "source", "n_chars"))
    val rates = Sampling.temperatureMixture(skewed, "doc_id", "lang",
      alpha = 0.5, budget = 100L)
    // can't assert a specific tiny row survives (expectation 1/3 of the
    // ring), but the threshold clamp is deterministic: re-run equality
    // under repartitioning IS the contract
    val a = rates.select("doc_id").as[Long].collect().sorted
    val b = Sampling.temperatureMixture(skewed.repartition(7), "doc_id",
      "lang", alpha = 0.5, budget = 100L)
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b))
    val ex = intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(docs, "doc_id", "lang", alpha = 0.3,
        budget = 100L)
    }
    assert(ex.getMessage.contains("determinism contract"))
  }

  test("epochShuffle: a deterministic permutation per epoch, contiguous shard positions") {
    val keys = (0L until 500L).map(Tuple1(_)).toDF("doc_id")
    val e3a = Sampling.epochShuffle(keys, "doc_id", epoch = 3, shards = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val e3b = Sampling.epochShuffle(keys.repartition(13), "doc_id", epoch = 3, shards = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(e3a === e3b, "same epoch must reproduce the identical order on any partitioning")
    // every shard's positions are exactly 1..n (a usable loader order)
    e3a.values.groupBy(_._1).foreach { case (_, rows) =>
      val pos = rows.map(_._2).toSeq.sorted
      assert(pos === (1L to pos.size.toLong))
    }
    // a different epoch is a genuinely different permutation
    val e4 = Sampling.epochShuffle(keys, "doc_id", epoch = 4, shards = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(e3a !== e4)
  }

  test("packingAudit: bins, token mass, capacity and waste per stream") {
    // one bucket (ids all ≡ 0 mod 1): lengths 60,50,40,30 pack in desc
    // order under budget 100 → bin0 = [60,50) overflow? no: starts
    // 0,60,110,150 → bins 0,0,1,1 — bin0 holds 60+50=110 (overflowing
    // doc 50 STARTS at offset 60 inside bin 0), bin1 holds 40+30=70
    val d = Seq((0L, 60L), (4L, 50L), (8L, 40L), (12L, 30L))
      .toDF("doc_id", "n_tokens")
    val audit = Sampling.packingAudit(
      Sampling.packSequences(d, "doc_id", "n_tokens", budget = 100L,
        buckets = 1), "n_tokens", budget = 100L).head()
    assert(audit.getAs[Long]("n_bins") === 2L)
    assert(audit.getAs[Long]("n_docs") === 4L)
    assert(audit.getAs[Long]("total_tokens") === 180L)
    assert(audit.getAs[Long]("capacity") === 200L)
    assert(audit.getAs[Long]("waste_permyriad") === 1000L) // 20/200
  }

  test("packingAudit: oversized documents drive waste negative (real signal)") {
    val d = Seq((0L, 250L), (4L, 10L)).toDF("doc_id", "n_tokens")
    // starts 0,250 → bins 0,2: two bins used, 260 tokens, capacity 200
    val audit = Sampling.packingAudit(
      Sampling.packSequences(d, "doc_id", "n_tokens", budget = 100L,
        buckets = 1), "n_tokens", budget = 100L).head()
    assert(audit.getAs[Long]("n_bins") === 2L)
    assert(audit.getAs[Long]("capacity") === 200L)
    assert(audit.getAs[Long]("waste_permyriad") === -3000L) // (200-260)/200
  }
}
