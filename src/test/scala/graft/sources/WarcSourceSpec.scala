package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WARC-style archive framing: write→read round trip across multiple part
  * files, dirty-record tolerance, and the documented delimiter-in-payload
  * limit surfacing as a detectable framing_ok=false rather than silence.
  */
class WarcSourceSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark makes plans", "src0"),
    (2L, "tables hold rows", "src1"),
    (3L, "", "src2"), // empty payload: a legal zero-length record
    (4L, "joins need keys and keys need hashes", "src0"))
    .toDF("doc_id", "text", "source")

  test("round trip: every record recovered with exact payload and headers") {
    val dir = Files.createTempDirectory("warc_rt").toString
    // repartition(3): records spread over several part files — each part
    // is an independent archive, none may lose its first/last record
    WarcSource.write(docs.repartition(3), "doc_id", "text", "source", dir)
    val got = WarcSource.read(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(got.length == 4)
    val byUrl = got.map(r => r._1 -> r).toMap
    val r1 = byUrl("http://src0.example/doc/1")
    assert(r1._2 == "2026-01-01T00:00:00Z")
    assert(r1._3 == "spark makes plans".length.toLong)
    assert(r1._4 == "spark makes plans")
    assert(byUrl("http://src2.example/doc/3")._4 == "")
    // Content-Length matches actual payload length on every record
    assert(got.forall(r => r._3 == r._4.length.toLong))
  }

  test("Content-Length is BYTES: multi-byte payloads frame correctly") {
    val dir = Files.createTempDirectory("warc_utf8").toString
    val utf8 = Seq((7L, "café über", "src0")).toDF("doc_id", "text", "source")
    WarcSource.write(utf8, "doc_id", "text", "source", dir)
    val got = WarcSource.read(spark, dir).head()
    val payload = got.getString(3)
    assert(payload == "café über")
    // declared length = UTF-8 bytes (2 two-byte chars -> chars + 2),
    // NOT the character count — the WARC framing contract
    assert(got.getLong(2) == payload.getBytes("UTF-8").length.toLong)
    assert(got.getLong(2) == payload.length.toLong + 2)
  }

  test("dirty record: malformed headers yield empty fields, scan survives") {
    val dir = Files.createTempDirectory("warc_dirty").toString
    Seq("this is not a warc record at all")
      .toDF("value").write.mode("overwrite")
      .option("lineSep", WarcSource.RecordDelimiter).text(dir)
    val got = WarcSource.read(spark, dir).head()
    assert(got.getString(0) == "") // no URI header
    assert(got.isNullAt(2)) // no Content-Length -> null, not a crash
  }

  test("delimiter inside a payload splits the record but is DETECTABLE") {
    val dir = Files.createTempDirectory("warc_delim").toString
    val evil = Seq((9L, "before" + WarcSource.RecordDelimiter + "after", "src0"))
      .toDF("doc_id", "text", "source")
    WarcSource.write(evil, "doc_id", "text", "source", dir)
    val got = WarcSource.read(spark, dir).collect()
    // the record split early: the parsed payload no longer matches its
    // declared Content-Length — the mismatch is the detection signal the
    // scaladoc promises (real WARC uses length framing for this reason)
    val parsed = got.find(_.getString(0).endsWith("/doc/9")).get
    assert(!parsed.isNullAt(2) && parsed.getLong(2) != parsed.getString(3).length.toLong)
  }
}
