package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Seeded scale-fixture generator for the scaling study (SCALING.md).
  *
  * Produces `documents`, `embeddings`, `lineitem`, `orders`, `supplier`
  * parquet tables with the same SHAPE as the driver's TESTDATA.md sf0.1
  * fixtures (vocab-sentence documents with planted near-duplicate
  * clusters, 64-dim float embeddings with label clusters, a TPC-H-ish
  * fact/dim star) at an arbitrary multiple of that scale — so the same
  * `SparkEntry.queries` run unmodified on `x1` and `x10` directories and
  * wall-time/plan growth can be compared apples-to-apples (both scales
  * come from THIS generator; the driver fixture is never the baseline).
  *
  * Determinism: every value derives from `xxhash64(id, tag)` — no RNG, no
  * timestamps — so regeneration is bit-identical on any cluster layout
  * (generation itself is `spark.range`-parallel: no driver-side loops).
  *
  * Usage: `runMain graft.ScaleFixture <outDir> <mult>` (mult=1 → sf0.1
  * shape: 5 000 docs / 2 000 embeddings / 600 000 lineitem).
  */
object ScaleFixture {

  private val vocab: Seq[String] = Seq(
    "spark", "batch", "stream", "table", "column", "row", "value", "key",
    "join", "group", "agg", "filter", "sort", "scan", "query", "window",
    "hash", "merge", "data", "part", "order", "line", "customer", "vector",
    "fast", "slow", "big", "small", "the", "a")

  private def h(tag: String, cols: org.apache.spark.sql.Column*) =
    abs(xxhash64((lit(tag) +: cols): _*))

  /** Vocab-sentence documents with planted near-duplicates: every 20th id
    * re-emits the PREVIOUS id's deterministic token stream with ~1/16 of
    * tokens substituted — 3-gram shingle Jaccard lands ≈0.55–0.8, inside
    * the `minJaccard = 0.5` dedup band, at the same ~5 % planted-dup rate
    * the driver fixture shows. No join needed: a copy's tokens regenerate
    * from the TARGET id's hash stream.
    *
    * Scale-stable shingle statistics: tokens carry a THEME suffix, and the
    * number of themes grows with the corpus (~25 docs per theme) — so a
    * given 3-gram's document frequency stays bounded as the corpus grows,
    * the way real corpora behave (vocabulary grows with size; boilerplate
    * df does not explode 10× because the corpus did). A fixed tiny vocab
    * would instead push EVERY shingle past the dedup df-cap at 10× and
    * vacuously zero the candidate set.
    */
  def documents(spark: SparkSession, n: Long): DataFrame =
    documents(spark, n, boilerplate = false)

  /** `boilerplate = true` is the SKEW-STRESS corpus (r6 verdict item 4):
    * 20 % of documents (`doc_id % 5 == 4`) re-emit ONE shared template —
    * doc 0's token stream with ~1/16 per-doc mutations — the
    * boilerplate-heavy shape real web corpora show (cookie banners,
    * license headers). Every one of the template family's shingles has
    * document frequency ≈ n/5: the hottest possible key for the shingle
    * shuffle, the window-based df count, the band buckets, and one giant
    * candidate component for connected components. The uniform fixture's
    * df caps are proven; this corpus proves them AT the hot key.
    */
  def documents(spark: SparkSession, n: Long, boilerplate: Boolean): DataFrame = {
    val ids = spark.range(0, n, 1, 32).toDF("doc_id")
    val isBoiler = if (boilerplate) col("doc_id") % 5 === 4 else lit(false)
    val isDup = col("doc_id") % 20 === 19 && !isBoiler
    val mutated = isDup || isBoiler
    val srcId = when(isBoiler, lit(0L))
      .when(isDup, col("doc_id") - 1).otherwise(col("doc_id"))
    val nTok = (h("len", srcId) % 83 + 8).cast(IntegerType)
    val vlit = typedLit(vocab)
    val nThemes = math.max(1L, n / 25)
    val theme = h("theme", srcId) % nThemes
    val toks = transform(sequence(lit(0), nTok - 1), j => {
      val base = concat(
        element_at(vlit, (h("tok", srcId, j) % vocab.size).cast(IntegerType) + 1),
        lit("_"), theme)
      val mut = concat(
        element_at(vlit, (h("alt", col("doc_id"), j) % vocab.size).cast(IntegerType) + 1),
        lit("_"), theme)
      when(mutated && h("mut", col("doc_id"), j) % 16 === 0, mut).otherwise(base)
    })
    ids.select(
        col("doc_id"),
        concat_ws(" ", toks).as("text"),
        when(h("lang", col("doc_id")) % 100 < 41, "en")
          .when(h("lang", col("doc_id")) % 100 < 56, "zh")
          .when(h("lang", col("doc_id")) % 100 < 71, "es")
          .when(h("lang", col("doc_id")) % 100 < 86, "fr")
          .otherwise("de").as("lang"),
        concat(lit("src"), h("src", col("doc_id")) % 20).as("source"))
      .withColumn("n_chars", length(col("text")).cast(LongType))
  }

  /** 64-dim float embeddings in 10 label clusters: a label-dependent
    * center offset plus hash-uniform noise — same value range/std shape
    * as the driver fixture (±~0.5, σ≈0.125).
    */
  def embeddings(spark: SparkSession, n: Long): DataFrame = {
    val ids = spark.range(0, n, 1, 32).toDF("vec_id")
    val label = (h("label", col("vec_id")) % 10).cast(IntegerType)
    val emb = transform(sequence(lit(0), lit(63)), d => {
      val center = ((h("ctr", label.cast(LongType), d) % 400) - 200).cast(DoubleType) / 1000.0
      val noise = ((h("nz", col("vec_id"), d) % 500) - 250).cast(DoubleType) / 1000.0
      ((center + noise) / 2.0).cast(FloatType)
    })
    ids.select(col("vec_id"), emb.as("embedding"), label.as("label"))
  }

  /** TPC-H-ish fact + dims, just enough surface for the bars/as-of path:
    * `nSupp` scales with the multiplier so symbol cardinality (join-key
    * space) grows with the data like a real tick store's would.
    */
  def star(spark: SparkSession, nLineitem: Long, nOrders: Long, nSupp: Long):
      (DataFrame, DataFrame, DataFrame) = {
    val li = spark.range(0, nLineitem, 1, 32).toDF("id").select(
      (col("id") / 4).cast(LongType).as("l_orderkey"),
      (h("pk", col("id")) % (nSupp * 20)).as("l_partkey"),
      (h("sk", col("id")) % nSupp).as("l_suppkey"),
      (col("id") % 4 + 1).cast(IntegerType).as("l_linenumber"),
      (h("qty", col("id")) % 50 + 1).cast(DoubleType).as("l_quantity"),
      ((h("px", col("id")) % 900000 + 90000).cast(DoubleType) / 100.0).as("l_extendedprice"),
      ((h("disc", col("id")) % 11).cast(DoubleType) / 100.0).as("l_discount"),
      ((h("tax", col("id")) % 9).cast(DoubleType) / 100.0).as("l_tax"),
      element_at(typedLit(Seq("A", "N", "R")),
        (h("rf", col("id")) % 3).cast(IntegerType) + 1).as("l_returnflag"),
      element_at(typedLit(Seq("O", "F")),
        (h("ls", col("id")) % 2).cast(IntegerType) + 1).as("l_linestatus"),
      to_timestamp(date_add(to_date(lit("1992-01-01")),
        (h("sd", col("id")) % 2500).cast(IntegerType))).as("l_shipdate"))
    val orders = spark.range(0, nOrders, 1, 32).toDF("o_orderkey").select(
      col("o_orderkey"),
      (h("ck", col("o_orderkey")) % (nOrders / 10 + 1)).as("o_custkey"),
      element_at(typedLit(Seq("O", "F", "P")),
        (h("st", col("o_orderkey")) % 3).cast(IntegerType) + 1).as("o_orderstatus"),
      ((h("tp", col("o_orderkey")) % 40000000 + 100000).cast(DoubleType) / 100.0)
        .as("o_totalprice"),
      to_timestamp(date_add(to_date(lit("1992-01-01")),
        (h("od", col("o_orderkey")) % 2500).cast(IntegerType))).as("o_orderdate"),
      concat(lit(""), (h("pr", col("o_orderkey")) % 5 + 1).cast(IntegerType),
        lit("-PRIORITY")).as("o_orderpriority"))
    val supplier = spark.range(0, nSupp, 1, 8).toDF("s_suppkey").select(
      col("s_suppkey"),
      concat(lit("Supplier#"), col("s_suppkey")).as("s_name"),
      (h("nk", col("s_suppkey")) % 25).cast(IntegerType).as("s_nationkey"),
      ((h("ab", col("s_suppkey")) % 2000000).cast(DoubleType) / 100.0 - 1000.0)
        .as("s_acctbal"))
    (li, orders, supplier)
  }

  def writeAll(spark: SparkSession, outDir: String, mult: Int,
      skewed: Boolean = false): Unit = {
    require(mult >= 1, s"mult must be >= 1, got $mult")
    val m = mult.toLong
    def put(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    put(documents(spark, 5000L * m, boilerplate = skewed), "documents")
    if (skewed) return // the skew study reads only the document corpus
    put(embeddings(spark, 2000L * m), "embeddings")
    val (li, orders, supplier) = star(spark, 600000L * m, 150000L * m, 1000L * m)
    put(li, "lineitem")
    put(orders, "orders")
    put(supplier, "supplier")
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2 || (args.length == 3 && args(2) == "skew"),
      "usage: ScaleFixture <outDir> <mult> [skew]")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    writeAll(spark, args(0), args(1).toInt, skewed = args.length == 3)
    spark.stop()
  }
}
