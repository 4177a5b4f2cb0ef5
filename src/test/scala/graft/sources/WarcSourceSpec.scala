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

  // ------------------------------------------------- gzip-member archives

  private def crafted(headers: Seq[(String, String)], payload: Array[Byte]) =
    WarcSource.gzipMember(headers, payload)

  private def writeFile(dir: String, name: String, bytes: Array[Byte]): Unit =
    Files.write(new java.io.File(dir, name).toPath, bytes)

  test("gzip round trip: per-record members, mixed charsets transcoded to UTF-8") {
    val dir = Files.createTempDirectory("warcgz_rt").toString
    val mixed = Seq(
      (1L, "plain ascii prose", "s0", "UTF-8"),
      (2L, "café résumé naïve", "s1", "ISO-8859-1"),
      (3L, "日本語テキスト", "s2", "Shift_JIS"),
      (4L, "", "s0", "US-ASCII")) // zero-length payload is a legal member
      .toDF("doc_id", "text", "source", "cs")
    WarcSource.writeGzip(mixed.repartition(2), "doc_id", "text", "source",
      dir, charsetCol = Some("cs"))
    val got = WarcSource.readGzip(spark, dir)
      .collect().map(r => r.getAs[String]("url") ->
        ((r.getAs[String]("charset"), r.getAs[Long]("content_length"),
          r.getAs[String]("payload"), r.getAs[String]("corrupt_reason"))))
      .toMap
    assert(got.size == 4)
    // payload comes back as the ORIGINAL string (transcode inverts the
    // encode), content_length is the byte count in the DECLARED charset
    assert(got("http://s1.example/doc/2") ==
      (("ISO-8859-1", 17L, "café résumé naïve", null)))
    assert(got("http://s2.example/doc/3") ==
      (("Shift_JIS", 14L, "日本語テキスト", null)))
    assert(got("http://s0.example/doc/4") == (("US-ASCII", 0L, "", null)))
    assert(got.values.forall(_._4 == null), "no corrupt rows on a clean archive")
  }

  test("manifest ranged read ≡ whole-file walk, and prunes to selected members") {
    val dir = Files.createTempDirectory("warcgz_manifest").toString
    val docs40 = (0L until 40L).map(i => (i, s"doc body number $i word" * 3, s"s${i % 4}"))
      .toDF("doc_id", "text", "source")
    WarcSource.writeGzip(docs40.repartition(4), "doc_id", "text", "source", dir)
    val manifest = WarcSource.memberManifest(spark, dir)
    assert(manifest.count() == 40)
    val full = WarcSource.readGzip(spark, dir)
    val ranged = WarcSource.readGzipMembers(spark, dir, manifest)
    // identical rows INCLUDING member offsets (ranged reads rebase)
    assert(ranged.except(full).isEmpty && full.except(ranged).isEmpty)
    // pruning the manifest prunes the archive read to those members
    val some = WarcSource.readGzipMembers(spark, dir, manifest.limit(7))
    assert(some.count() == 7 && some.where(col("payload").isNull).count() == 0)
  }

  test("archive rewrite clears stale parts: fewer partitions, no resurrection") {
    val dir = Files.createTempDirectory("warcgz_rw").toString
    val v1 = (0L until 12L).map(i => (i, s"old body $i", "s0"))
      .toDF("doc_id", "text", "source")
    WarcSource.writeGzip(v1.repartition(4), "doc_id", "text", "source", dir)
    val v2 = (100L until 106L).map(i => (i, s"new body $i", "s0"))
      .toDF("doc_id", "text", "source")
    WarcSource.writeGzip(v2.repartition(2), "doc_id", "text", "source", dir)
    val got = WarcSource.readGzip(spark, dir)
    assert(got.count() == 6, "stale wider-run parts must not resurrect")
    assert(got.where(col("payload").startsWith("old")).count() == 0)
    // and the manifest agrees with the walk after the rewrite
    val ranged = WarcSource.readGzipMembers(spark, dir,
      WarcSource.memberManifest(spark, dir))
    assert(ranged.except(got).isEmpty && got.except(ranged).isEmpty)
  }

  test("hostile manifest rows route as corrupt instead of killing the task") {
    val dir = Files.createTempDirectory("warcgz_badman").toString
    val docs2 = Seq((1L, "fine", "s0")).toDF("doc_id", "text", "source")
    WarcSource.writeGzip(docs2, "doc_id", "text", "source", dir)
    val good = WarcSource.memberManifest(spark, dir)
    val bad = Seq(
      ("part-00000.warc.gz", 0L, -5L),          // negative length
      ("part-00000.warc.gz", 1L << 40, 100L),   // offset past EOF
      ("no-such-file.warc.gz", 0L, 64L))        // missing file
      .toDF("file", "member_offset", "member_length")
    val rows = WarcSource.readGzipMembers(spark, dir, good.unionByName(bad))
      .collect()
    assert(rows.count(_.getAs[String]("corrupt_reason") == null) == 1)
    // the range defects route as range errors; the invented file routes
    // under its OWN reason (a deterministic manifest defect — distinct
    // from transient I/O, which PROPAGATES so Spark retries the task)
    assert(rows.count(_.getAs[String]("corrupt_reason") == "bad_manifest_range") == 2)
    assert(rows.count(_.getAs[String]("corrupt_reason") == "missing_file") == 1)
  }

  test("ranged read coalesces contiguous runs without changing rows") {
    val dir = Files.createTempDirectory("warcgz_coalesce").toString
    val docs60 = (0L until 60L).map(i => (i, s"body $i " * 5, "s0"))
      .toDF("doc_id", "text", "source")
    WarcSource.writeGzip(docs60.repartition(2), "doc_id", "text", "source", dir)
    val manifest = WarcSource.memberManifest(spark, dir)
    val full = WarcSource.readGzip(spark, dir)
    // one sorted partition: every file collapses to ONE coalesced read
    val sorted = WarcSource.readGzipMembers(spark, dir,
      manifest.repartition(1).sortWithinPartitions("file", "member_offset"))
    assert(sorted.except(full).isEmpty && full.except(sorted).isEmpty)
    // reverse-sorted: nothing is contiguous, per-row path — same rows
    val reversed = WarcSource.readGzipMembers(spark, dir,
      manifest.repartition(1)
        .sortWithinPartitions(col("file"), col("member_offset").desc))
    assert(reversed.except(full).isEmpty && full.except(reversed).isEmpty)
    // a gapped selection (~half the members, by length parity) still
    // returns exactly those
    val sel = manifest.where(col("member_length") % 2 === 0)
    val ranged = WarcSource.readGzipMembers(spark, dir,
      sel.repartition(1).sortWithinPartitions("file", "member_offset"))
    assert(ranged.count() == sel.count())
    assert(ranged.where(col("corrupt_reason").isNotNull).count() == 0)
  }

  test("torn writeGzip (manifest without commit marker) is refused") {
    val dir = Files.createTempDirectory("warcgz_torn").toString
    val docs1 = Seq((1L, "fine", "s0")).toDF("doc_id", "text", "source")
    WarcSource.writeGzip(docs1, "doc_id", "text", "source", dir)
    // no leftover per-attempt temps after a clean commit
    val leftovers = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.contains(".warc.gz.tmp-"))
    assert(leftovers.isEmpty, s"uncommitted temps: ${leftovers.mkString(",")}")
    // simulate the crash window: parts+manifest exist, marker missing
    assert(new java.io.File(dir, WarcSource.CommitMarker).delete())
    val e = intercept[IllegalStateException] {
      WarcSource.memberManifest(spark, dir).count()
    }
    assert(e.getMessage.contains("no " + WarcSource.CommitMarker))
    intercept[IllegalStateException] { WarcSource.readGzip(spark, dir).count() }
    // a fresh writeGzip heals the archive
    WarcSource.writeGzip(docs1, "doc_id", "text", "source", dir)
    assert(WarcSource.readGzip(spark, dir).count() == 1)
  }

  test("corrupt member routes and the walk RESUMES at the next gzip magic") {
    val dir = Files.createTempDirectory("warcgz_corrupt").toString
    val m1 = crafted(Seq("WARC-Target-URI" -> "http://h.example/doc/1",
      "Content-Type" -> "text/plain; charset=UTF-8",
      "Content-Length" -> "6"), "first!".getBytes("UTF-8"))
    val garbage = "NOT-A-GZIP-REGION".getBytes("UTF-8")
    val m2 = crafted(Seq("WARC-Target-URI" -> "http://h.example/doc/2",
      "Content-Type" -> "text/plain; charset=UTF-8",
      "Content-Length" -> "7"), "second!".getBytes("UTF-8"))
    // CRC-corrupted member: flip one byte INSIDE m1's deflate region
    val m3 = m1.clone(); m3(12) = (m3(12) ^ 0x01).toByte
    writeFile(dir, "part-00000.warc.gz", m1 ++ garbage ++ m2 ++ m3)
    val rows = WarcSource.readGzip(spark, dir)
      .orderBy("member_offset").collect()
    assert(rows.length == 4)
    assert(rows(0).getAs[String]("payload") == "first!")
    assert(rows(1).getAs[String]("corrupt_reason") == "bad_gzip_member")
    assert(rows(1).getAs[Long]("member_length") == garbage.length.toLong)
    assert(rows(2).getAs[String]("payload") == "second!",
      "the member after a corrupt region must still be recovered")
    val last = rows(3).getAs[String]("corrupt_reason")
    assert(last == "crc_mismatch" || last == "bad_deflate_stream",
      s"tampered member must be detected, got $last")
  }

  test("charset contract: sniff fallback, unsupported name, decode failure") {
    val dir = Files.createTempDirectory("warcgz_charset").toString
    // no charset declared + invalid UTF-8 bytes → ISO-8859-1 fallback
    val sniffed = crafted(Seq("WARC-Target-URI" -> "http://h.example/doc/10",
      "Content-Type" -> "text/plain"),
      "naïve café".getBytes("ISO-8859-1"))
    // no charset declared + valid UTF-8 → UTF-8
    val utf8 = crafted(Seq("WARC-Target-URI" -> "http://h.example/doc/11"),
      "café utf8".getBytes("UTF-8"))
    // declared but unknown to the JVM → routed, name preserved
    val bogus = crafted(Seq("WARC-Target-URI" -> "http://h.example/doc/12",
      "Content-Type" -> "text/plain; charset=x-enigma-9"),
      "ascii body".getBytes("UTF-8"))
    // declared UTF-8, bytes are not → decode error, not silent mojibake
    val broken = crafted(Seq("WARC-Target-URI" -> "http://h.example/doc/13",
      "Content-Type" -> "text/plain; charset=UTF-8",
      "Content-Length" -> "3"), Array(0xff.toByte, 0xfe.toByte, 0x41.toByte))
    writeFile(dir, "part-00000.warc.gz", sniffed ++ utf8 ++ bogus ++ broken)
    val rows = WarcSource.readGzip(spark, dir).orderBy("member_offset")
      .select("charset", "payload", "corrupt_reason")
      .as[(String, String, String)].collect()
    assert(rows(0) == (("ISO-8859-1", "naïve café", null)))
    assert(rows(1) == (("UTF-8", "café utf8", null)))
    assert(rows(2) == (("x-enigma-9", null, "unsupported_charset:x-enigma-9")))
    assert(rows(3) == (("UTF-8", null, "decode_error:UTF-8")))
  }

  test("zip bomb guard: an over-cap member routes instead of buffering") {
    val dir = Files.createTempDirectory("warcgz_bomb").toString
    val big = crafted(Seq("WARC-Target-URI" -> "http://h.example/doc/20"),
      Array.fill(256 * 1024)('a'.toByte)) // compresses tiny, inflates 256 KiB
    val ok = crafted(Seq("WARC-Target-URI" -> "http://h.example/doc/21"),
      "small".getBytes("UTF-8"))
    writeFile(dir, "part-00000.warc.gz", big ++ ok)
    val rows = WarcSource.readGzip(spark, dir, maxMemberBytes = 64 * 1024)
      .orderBy("member_offset")
      .select("payload", "corrupt_reason").as[(String, String)].collect()
    assert(rows(0) == ((null, "member_too_large")))
    assert(rows(1) == (("small", null)), "the scan continues past the bomb")
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
