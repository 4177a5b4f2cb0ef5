package graft.sources

import graft.SparkSpec
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** JsonlSource — the corrupt-line routing contract the oracle round trip
  * can't isolate: exact corrupt counts, partial-field preservation on
  * mistyped rows, strict-mode failure, and missing-field tolerance
  * (schema evolution: an old shard read under a newer schema).
  */
class JsonlSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  private def tmpDir(): java.io.File = {
    val d = Files.createTempDirectory("graft_jsonl_spec").toFile
    d.deleteOnExit(); d
  }

  private def writeLines(dir: java.io.File, name: String, lines: String*): Unit =
    Files.write(new java.io.File(dir, name).toPath,
      java.util.Arrays.asList(lines: _*), StandardCharsets.UTF_8)

  test("corrupt lines route to the corrupt column; clean rows parse exactly") {
    val d = tmpDir()
    writeLines(d, "a.jsonl",
      """{"id": 1, "text": "alpha"}""",
      """{"id": 2, "text": "beta"""", // truncated
      """garbage line""",
      """{"id": 3, "text": "gamma"}""")
    val df = JsonlSource.read(spark, d.getPath, schema)
    assert(JsonlSource.corrupt(df).count() === 2)
    val goodRows = JsonlSource.good(df).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(goodRows.toSeq === Seq(1L -> "alpha", 3L -> "gamma"))
    // corrupt rows carry the raw line for debugging
    val raw = JsonlSource.corrupt(df)
      .select(col(JsonlSource.CorruptCol)).collect().map(_.getString(0)).toSet
    assert(raw.exists(_.contains("garbage line")))
  }

  test("a mistyped field is routed as corrupt WITH well-typed siblings kept") {
    val d = tmpDir()
    writeLines(d, "a.jsonl", """{"id": "oops", "text": "still here"}""")
    val df = JsonlSource.read(spark, d.getPath, schema)
    val r = JsonlSource.corrupt(df).collect()
    assert(r.length === 1)
    assert(r(0).isNullAt(r(0).fieldIndex("id"))) // unconvertible → null
    assert(r(0).getString(r(0).fieldIndex("text")) === "still here")
  }

  test("strict mode raises on the first corrupt line") {
    val d = tmpDir()
    writeLines(d, "a.jsonl", """{"id": 1, "text": "x"}""", """not json""")
    intercept[SparkException] {
      JsonlSource.readStrict(spark, d.getPath, schema).collect()
    }
  }

  test("a bare `null` or whitespace line routes as corrupt, never a phantom row") {
    // from_json parses these to a NULL STRUCT with no corrupt record —
    // the routing fallback must catch what the parser does not flag
    val d = tmpDir()
    writeLines(d, "a.jsonl", """{"id": 1, "text": "real"}""", "null", "   ")
    val df = JsonlSource.read(spark, d.getPath, schema)
    assert(JsonlSource.good(df).count() === 1, "phantom all-null row leaked")
    val raw = JsonlSource.corrupt(df)
      .select(JsonlSource.CorruptCol).collect().map(_.getString(0)).toSet
    assert(raw === Set("null", "   "), s"raw lines not preserved: $raw")
    // and strict mode raises on them instead of yielding a null record
    intercept[SparkException] {
      JsonlSource.readStrict(spark, d.getPath, schema).collect()
    }
  }

  test("an EMPTY line routes as corrupt (raw line \"\"), never silently dropped") {
    // the r8 advice gap: zero-length lines were pre-filtered, so they
    // vanished even in fail-fast mode — one row per PHYSICAL line now
    // includes the degenerate line
    val d = tmpDir()
    writeLines(d, "a.jsonl", """{"id": 1, "text": "real"}""", "",
      """{"id": 2, "text": "also real"}""")
    val df = JsonlSource.read(spark, d.getPath, schema)
    assert(df.count() === 3, "one row per physical line, empty included")
    assert(JsonlSource.good(df).count() === 2)
    val raw = JsonlSource.corrupt(df)
      .select(JsonlSource.CorruptCol).collect().map(_.getString(0)).toSeq
    assert(raw === Seq(""), s"empty line not routed as corrupt: $raw")
    // and strict mode raises on it instead of dropping it (surfaced as
    // the raise_error guard's SparkRuntimeException: FAILFAST itself
    // accepts the empty line as a silent null record)
    val e = intercept[Exception] {
      JsonlSource.readStrict(spark, d.getPath, schema).collect()
    }
    assert(e.isInstanceOf[org.apache.spark.SparkThrowable],
      s"unexpected failure type: $e")
  }

  test("schema evolution: a missing field reads as null, not corrupt") {
    val d = tmpDir()
    writeLines(d, "old.jsonl", """{"id": 7}""") // old shard: no text field
    val df = JsonlSource.read(spark, d.getPath, schema)
    assert(JsonlSource.corrupt(df).count() === 0)
    val r = JsonlSource.good(df).collect()
    assert(r.length === 1 && r(0).getLong(0) === 7L && r(0).isNullAt(1))
  }

  test("write → read round trip preserves values, types, and escapes") {
    import spark.implicits._
    val d = new java.io.File(tmpDir(), "out")
    val src = Seq(
      (1L, "plain"),
      (2L, "quote \" backslash \\ tab\t newline-free"),
      (3L, "unicode é中")).toDF("id", "text")
    JsonlSource.write(src, d.getPath)
    val back = JsonlSource.good(JsonlSource.read(spark, d.getPath, schema))
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      Seq("id" -> LongType, "text" -> StringType))
    assert(back.except(src).isEmpty && src.except(back).isEmpty)
  }

  test("streaming twin: shards arrive as micro-batches with identical corrupt routing") {
    val d = tmpDir()
    writeLines(d, "shard0.jsonl",
      """{"id": 1, "text": "first"}""",
      """broken line""")
    val ckpt = new java.io.File(tmpDir(), "ckpt")
    val q = JsonlSource.readStream(spark, d.getPath, schema)
      .writeStream.format("memory").queryName("jsonl_stream_out")
      .option("checkpointLocation", ckpt.getPath)
      .start()
    try {
      q.processAllAvailable()
      // a shard dropped AFTER the stream started is picked up incrementally
      writeLines(d, "shard1.jsonl", """{"id": 2, "text": "second"}""")
      q.processAllAvailable()
      val out = spark.table("jsonl_stream_out")
      assert(JsonlSource.good(out).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq ===
        Seq(1L -> "first", 2L -> "second"))
      // stream ≡ batch: the same corrupt contract, line for line
      assert(JsonlSource.corrupt(out).count() ===
        JsonlSource.corrupt(JsonlSource.read(spark, d.getPath, schema)).count())
    } finally q.stop()
  }

  test("the record schema must not smuggle the corrupt column") {
    intercept[IllegalArgumentException] {
      JsonlSource.read(spark, "/nonexistent",
        schema.add(JsonlSource.CorruptCol, StringType))
    }
  }
}
