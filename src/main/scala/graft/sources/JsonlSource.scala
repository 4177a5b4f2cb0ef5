package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Newline-delimited JSON (`.jsonl`) corpus ingest/egress — the lingua
  * franca of LLM training-data exchange (reference scope: the staging
  * seam of SURVEY §2.1 — the reference stages frames as CSV files between
  * pipeline tasks, `dags/sp500_dag.py.py:214-260`; jsonl plays the same
  * interchange role for document corpora, so it gets the same
  * first-class source/sink treatment as S4's CSV stage).
  *
  * Scale/robustness contract:
  *  - EXPLICIT schema, never inference: schema inference is a full extra
  *    pass over the corpus before the real read starts — at 100 TB that
  *    is a second 100 TB scan bought for nothing a caller couldn't
  *    declare. [[read]] refuses to exist without a schema.
  *  - PERMISSIVE parse with a corrupt-record column: one mangled line in
  *    a billion must not kill a six-hour job, and must not vanish
  *    silently either. Corrupt lines are ROUTED — the raw line lands in
  *    [[CorruptCol]], the parsed columns stay null — and [[good]] /
  *    [[corrupt]] split the stream. [[readStrict]] is the fail-fast
  *    variant for contexts where a bad line means a broken producer.
  *  - newline framing is SPLITTABLE: Spark's JSON reader splits shards on
  *    line boundaries, so one 1 TB file still fans out across executors;
  *    no custom InputFormat.
  */
object JsonlSource {

  /** Raw-line column populated on parse failure (PERMISSIVE mode). */
  val CorruptCol: String = "_corrupt_record"

  /** Permissive jsonl read: `schema` is the DECLARED record shape (the
    * corrupt-record column is appended internally — don't include it).
    * Every line yields a row: parsed fields on success, nulls plus the
    * raw line in [[CorruptCol]] on failure. A line that parses as JSON
    * but mistypes a field (e.g. a string where the schema says BIGINT)
    * is ALSO routed to [[CorruptCol]], with any well-typed sibling
    * fields preserved — filter with [[good]] for the strict rows.
    *
    * Built as a splittable TEXT scan + `from_json` projection rather
    * than the native JSON file source: the file source forbids any plan
    * whose pruned column set is the corrupt column alone (counting the
    * corrupt stream — the first thing an ingest job does — would throw),
    * because it re-parses per query. Parsing as an EXPRESSION pins one
    * parse per line and makes every downstream projection legal; the
    * scan stays line-splittable and the parse stays in the scan's
    * whole-stage-codegen pass.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    validate(schema)
    parse(spark.read.text(path), schema)
  }

  /** Structured-streaming twin of [[read]]: the directory watched as a
    * stream — new jsonl shards dropped into `path` arrive as micro-batches
    * under the IDENTICAL permissive corrupt-routing contract (stream ≡
    * batch by construction: the parse is the same expression tree over
    * the same text scan). Pair with `Trigger.AvailableNow` for
    * catch-up-then-stop ingest, exactly like the repo's other streaming
    * twins.
    */
  def readStream(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    validate(schema)
    parse(spark.readStream.text(path), schema)
  }

  private def validate(schema: StructType): Unit =
    require(!schema.fieldNames.contains(CorruptCol),
      s"pass the record schema only; $CorruptCol is appended internally")

  private def parse(lines: DataFrame, schema: StructType): DataFrame = {
    val full = schema.add(CorruptCol, StringType, nullable = true)
    // A line holding the JSON literal `null` (a classic buggy-serializer
    // output) or only whitespace parses to a NULL STRUCT, not a malformed
    // record — from_json raises no error and fills no corrupt column. The
    // fallback struct routes those lines to [[CorruptCol]] too, keeping
    // the one-row-per-line contract airtight.
    val nullRow = struct(
      schema.fields.map(f => lit(null).cast(f.dataType).as(f.name)).toSeq :+
        col("value").as(CorruptCol): _*)
    // no pre-filter on empty lines: a zero-length line is NOT valid JSON,
    // so under the one-row-per-line contract it must surface as a corrupt
    // row (raw line = ""), not vanish — from_json yields a NULL struct for
    // it, and the nullRow fallback routes it like any other null-struct
    // line (bare `null`, whitespace-only)
    lines
      .select(col("value"), from_json(col("value"), full,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)).as("r"))
      .select(coalesce(col("r"), nullRow).as("r"))
      .select(col("r.*"))
  }

  /** Fail-fast jsonl read: any unparseable or mistyped line raises —
    * including null-struct lines (a bare `null`, whitespace-only, or
    * EMPTY line), which FAILFAST alone accepts as a silent null record.
    * Empty lines are deliberately NOT pre-filtered: in a fail-fast
    * context a blank line is a broken producer like any other. */
  def readStrict(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.text(path)
      .select(col("value"), from_json(col("value"), schema,
        Map("mode" -> "FAILFAST")).as("r"))
      .select(when(col("r").isNull,
        raise_error(concat(lit("Malformed jsonl line (null record): "),
          col("value"))))
        .otherwise(col("r")).as("r"))
      .select(col("r.*"))

  /** Cleanly-parsed rows, corrupt-record column dropped. */
  def good(df: DataFrame): DataFrame =
    df.where(col(CorruptCol).isNull).drop(CorruptCol)

  /** Rows that failed to parse, ALL columns kept (the raw line is in
    * [[CorruptCol]]; parsed siblings may be partially populated). Kept
    * wide deliberately: projecting the corrupt column alone from a raw
    * scan is rejected by Spark (the column is not data, it's a parse
    * side-channel), and the partial fields are the debugging signal.
    */
  def corrupt(df: DataFrame): DataFrame =
    df.where(col(CorruptCol).isNotNull)

  /** Write a frame as jsonl shards (one JSON object per line, standard
    * JSON string escaping — the exact framing [[read]] consumes). Shard
    * count = the frame's partitioning: size upstream with
    * `repartition`/`Conf.sizedShufflePartitions` for the target shard
    * size; this sink adds no shuffle of its own.
    */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
