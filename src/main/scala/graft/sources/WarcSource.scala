package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC-style web-archive ingest — the CommonCrawl-shaped source an
  * LLM-data pipeline reads by the petabyte (reference scope: SURVEY §2.1's
  * source family, extended per the LLM-pipeline brief).
  *
  * Spark-first design: records are framed by a custom record delimiter and
  * read with the TEXT datasource's `lineSep` option — a SPLITTABLE scan
  * (Hadoop's delimiter-aware split handling), so a terabyte archive fans
  * out across executors with no custom InputFormat, and header fields are
  * extracted by codegen'd `regexp_extract` projections — no UDFs, no
  * driver-side parsing. Filter + projection run in the same whole-stage
  * codegen pass as the scan.
  *
  * Framing contract (separator form): records are joined by
  * [[RecordDelimiter]] (the `WARC/1.0` version line doubling as the
  * separator); each record is `Header-Name: value` lines, one blank line,
  * then the payload. Honest limits, both inherent to delimiter framing:
  * a payload containing the delimiter byte sequence would split early
  * (real WARC readers use Content-Length framing — [[read]] surfaces the
  * mismatch via `content_length` vs payload length rather than hiding
  * it), and a real-WARC file needs its leading version line stripped
  * (one-line adapter at the seam).
  */
object WarcSource {

  /** Record separator: the WARC version line on its own line. */
  val RecordDelimiter: String = "\nWARC/1.0\n"

  /** Render documents as WARC-style record strings (one `value` column) —
    * a narrow codegen'd projection; URL derives from (source, id).
    * Content-Length is the payload's UTF-8 BYTE count (`octet_length`),
    * per the WARC spec — a character count would lie to any
    * length-framed consumer on the first non-ASCII payload.
    */
  def render(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame =
    docs.select(concat(
      lit("WARC-Target-URI: http://"), col(sourceCol),
      lit(".example/doc/"), col(idCol),
      lit("\nWARC-Date: 2026-01-01T00:00:00Z"),
      lit("\nContent-Length: "), octet_length(col(textCol)),
      lit("\n\n"), col(textCol)).as("value"))

  /** Write a WARC-style archive: text sink with the record delimiter as
    * `lineSep` (records join WITHIN each part file; parts are independent
    * archives, as WARC segments are).
    */
  def write(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, path: String): Unit =
    render(docs, idCol, textCol, sourceCol)
      .write.mode("overwrite").option("lineSep", RecordDelimiter).text(path)

  /** Read a WARC-style archive into (url, warc_date, content_length,
    * payload). Splittable scan + codegen'd header extraction; malformed
    * headers yield empty-string/null fields rather than failing the scan
    * (filter on them downstream — corpus ingest must survive dirty
    * records).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("lineSep", RecordDelimiter).text(path)
      .where(length(col("value")) > 0)
      .select(
        regexp_extract(col("value"), "(?m)^WARC-Target-URI: (.*)$", 1).as("url"),
        regexp_extract(col("value"), "(?m)^WARC-Date: (.*)$", 1).as("warc_date"),
        regexp_extract(col("value"), "(?m)^Content-Length: (\\d+)$", 1)
          .cast("long").as("content_length"),
        regexp_extract(col("value"), "(?s)\n\n(.*)$", 1).as("payload"))
}
