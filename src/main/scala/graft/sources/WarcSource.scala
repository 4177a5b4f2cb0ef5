package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed record from a gzip-member WARC archive
  * ([[WarcSource.readGzip]] / [[WarcSource.readGzipMembers]]). `file` is
  * the archive part-file basename; `member_offset`/`member_length` frame
  * the COMPRESSED member (the coordinates a manifest-driven ranged read
  * uses). A record that could not be fully decoded keeps every field it
  * did yield and sets `corrupt_reason`; `payload` is the UTF-8 transcode
  * of the member body (None when the body could not be decoded). */
final case class WarcGzRecord(
    file: String, member_offset: Long, member_length: Long,
    url: Option[String], warc_date: Option[String],
    content_type: Option[String], charset: Option[String],
    content_length: Option[Long], payload: Option[String],
    corrupt_reason: Option[String])

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

  // ------------------------------------------------------------------------
  // Gzip-member form — the real-world CommonCrawl layout: every record is
  // its OWN gzip member and an archive file is the plain concatenation of
  // members. Three consequences drive the design here:
  //   1. WRITE side: per-record compression is what makes the archive
  //      record-addressable at all — a member manifest (file, offset,
  //      length) written beside the data turns a 100 TB archive into a
  //      fan-out of independent positioned reads.
  //   2. READ side, no manifest: gzip members are not self-delimiting
  //      from the outside, so a file must be walked member by member —
  //      per-FILE parallelism ([[readGzip]]). With the manifest,
  //      per-MEMBER parallelism ([[readGzipMembers]]) — the scale path.
  //   3. Real payloads are not UTF-8: the Content-Type charset parameter
  //      is honored when present (transcode to UTF-8), sniffed when
  //      absent (strict UTF-8, else ISO-8859-1 — the HTTP legacy
  //      default), and a record that cannot be decoded is ROUTED, not
  //      thrown: `corrupt_reason` is set and the scan continues (the
  //      JsonlSource corrupt-routing contract; a petabyte crawl always
  //      contains garbage and one bad member must never kill a stage).
  // ------------------------------------------------------------------------

  /** Hard cap on a single member's DECOMPRESSED size: a crawl archive is
    * adversarial input by definition, and an unbounded inflate is a zip
    * bomb — a member exceeding the cap becomes a corrupt row, not an OOM. */
  val DefaultMaxMemberBytes: Int = 64 << 20

  /** Render one record (WARC version line + headers + blank line +
    * payload bytes) and gzip it as ONE member. Shared by [[writeGzip]]
    * and the fixture-crafting seams in specs/queries. Java's
    * GZIPOutputStream emits a fixed header (MTIME 0) — member bytes are
    * a pure function of the record, so rewritten tasks reproduce
    * identical files. */
  private[graft] def gzipMember(headers: Seq[(String, String)],
      payload: Array[Byte]): Array[Byte] = {
    val head = headers.map { case (k, v) => s"$k: $v" }
      .mkString("WARC/1.0\r\n", "\r\n", "\r\n\r\n")
    val bos = new java.io.ByteArrayOutputStream(payload.length / 2 + 256)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(head.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    gz.write(payload)
    gz.close()
    bos.toByteArray
  }

  /** Write a gzip-member WARC archive: one `.warc.gz` part file per input
    * partition (each record its own gzip member, CommonCrawl layout) plus
    * a member manifest at `"$path/_members"` (parquet: file,
    * member_offset, member_length) — the index [[readGzipMembers]] fans
    * out over. Rows are sorted by id within each partition, so a retried
    * task rewrites byte-identical output (idempotent under speculative
    * execution).
    *
    * @param charsetCol optional column naming each record's payload
    *   charset (default UTF-8): the payload is ENCODED in it and the
    *   Content-Type header declares it — the writer half of the reader's
    *   transcode contract. Must be JVM-supported; ASCII-incompatible
    *   charsets are fine (the header region is always ASCII).
    */
  def writeGzip(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, path: String,
      charsetCol: Option[String] = None): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Commit protocol: the completion marker is DELETED first and
    // rewritten only after the manifest parquet commits, so a crash
    // anywhere between part-file creation and the manifest commit leaves
    // an archive the readers REFUSE (no marker) instead of one whose
    // fresh parts silently disagree with a stale manifest (ranged reads
    // straddling member boundaries with no staleness signal).
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root, CommitMarker), false)
    // overwrite semantics at the ARCHIVE level: a rewrite with fewer
    // partitions must not leave stale part files from a wider previous
    // run (readGzip would resurrect them while the overwritten manifest
    // disagrees — silently breaking the ranged-read ≡ full-walk
    // equivalence); leftover per-attempt temps from a crashed run go too
    if (fs.exists(root))
      fs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        if (n.endsWith(".warc.gz") || n.contains(".warc.gz.tmp-"))
          fs.delete(st.getPath, false)
      }
    val sel = docs.select(col(idCol).cast("long").as("_1"),
      col(textCol).cast("string").as("_2"),
      col(sourceCol).cast("string").as("_3"),
      charsetCol.map(c => col(c).cast("string")).getOrElse(lit("UTF-8"))
        .as("_4"))
      .sortWithinPartitions("_1")
      .as[(Long, String, String, String)]
    val manifest = sel.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val tc = org.apache.spark.TaskContext.get()
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val fileName = f"part-$pid%05d.warc.gz"
        val target = new org.apache.hadoop.fs.Path(path, fileName)
        // ATTEMPT-SCOPED temp + rename-on-close: two concurrent attempts
        // of one task (speculation, or a retry racing a zombie) each
        // write their own temp — never interleaving bytes in one part
        // file — and the loser of the rename finds the target already
        // committed and discards its temp (attempts write byte-identical
        // output: sorted input + fixed gzip header, so either file is
        // correct).
        val attemptId = Option(tc).map(_.taskAttemptId()).getOrElse(0L)
        val tmp = new org.apache.hadoop.fs.Path(path,
          s"$fileName.tmp-$attemptId")
        // executor-side Configuration(): loads the cluster's core-site.xml
        // from the classpath (how Spark ships Hadoop conf to executors);
        // local runs resolve to the local FS
        val fs = target.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = fs.create(tmp, true)
        var offset = 0L
        val rows = it.map { case (id, text, source, cs) =>
          val charset = java.nio.charset.Charset.forName(cs)
          val payload = Option(text).getOrElse("").getBytes(charset)
          val member = gzipMember(Seq(
            "WARC-Target-URI" -> s"http://$source.example/doc/$id",
            "WARC-Date" -> "2026-01-01T00:00:00Z",
            "Content-Type" -> s"text/plain; charset=$cs",
            "Content-Length" -> payload.length.toString), payload)
          out.write(member)
          val row = (fileName, offset, member.length.toLong)
          offset += member.length
          row
        }.toVector // drain before close
        out.close()
        if (!fs.rename(tmp, target)) {
          // rename refuses when the target exists (HDFS/local contract):
          // a sibling attempt already committed identical bytes
          if (!fs.exists(target))
            throw new java.io.IOException(s"rename $tmp -> $target failed")
          fs.delete(tmp, false)
        }
        rows.iterator
      }
    }.toDF("file", "member_offset", "member_length")
    manifest.write.mode("overwrite").parquet(s"$path/_members")
    // marker last: parts + manifest are now mutually consistent
    fs.create(new org.apache.hadoop.fs.Path(root, CommitMarker), true).close()
  }

  /** Completion marker [[writeGzip]] commits LAST (after parts and
    * manifest): its absence beside a `_members` manifest means a torn
    * write, and the readers refuse the archive instead of serving ranged
    * reads against a stale index. */
  val CommitMarker: String = "_archive_committed"

  /** Fail fast on a torn [[writeGzip]] (manifest present, marker absent).
    * Archives without a manifest (hand-built fixtures, foreign layouts)
    * carry no marker contract and pass. */
  private def requireCommitted(spark: SparkSession, path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasManifest = fs.exists(new org.apache.hadoop.fs.Path(root, "_members"))
    if (hasManifest &&
        !fs.exists(new org.apache.hadoop.fs.Path(root, CommitMarker)))
      throw new IllegalStateException(
        s"gzip WARC archive at $path has a member manifest but no " +
          s"$CommitMarker marker: a writeGzip crashed between writing part " +
          "files and committing the manifest, so ranged reads against this " +
          "index may straddle member boundaries. Re-run writeGzip.")
  }

  /** The archive's member manifest as written by [[writeGzip]] (or any
    * compatible indexer): (file, member_offset, member_length). */
  def memberManifest(spark: SparkSession, path: String): DataFrame = {
    requireCommitted(spark, path)
    spark.read.parquet(s"$path/_members")
  }

  /** Read a gzip-member archive by walking whole files — per-FILE
    * parallelism (a gzip member stream is not splittable from the
    * outside), whole-file buffering. The right tool up to
    * file-sized-for-one-task archives; beyond that, write (or build) a
    * manifest and use [[readGzipMembers]]. Corrupt members become rows
    * with `corrupt_reason` set and the walk resumes at the next gzip
    * magic — a damaged region never kills the scan (spec-asserted). */
  def readGzip(spark: SparkSession, path: String,
      maxMemberBytes: Int = DefaultMaxMemberBytes): DataFrame = {
    import spark.implicits._
    requireCommitted(spark, path)
    spark.read.format("binaryFile").option("pathGlobFilter", "*.warc.gz")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        walkMembers(p.substring(p.lastIndexOf('/') + 1), bytes, 0L,
          maxMemberBytes)
      }
      .toDF()
  }

  /** Read SELECTED members by positioned range reads — the 100 TB path:
    * the manifest (file, member_offset, member_length) fans out across
    * executors, each task `readFully`s just its members' byte ranges
    * (no whole-file buffering, no scan of unrequested members), and
    * partition pruning on the manifest (a plain DataFrame) becomes
    * record-level pruning on the archive. Callers control partitioning;
    * co-locating a file's members in one partition
    * (`repartition(col("file"))` + sort by offset) turns the ranged
    * reads sequential. */
  def readGzipMembers(spark: SparkSession, path: String,
      manifest: DataFrame,
      maxMemberBytes: Int = DefaultMaxMemberBytes): DataFrame = {
    import spark.implicits._
    requireCommitted(spark, path)
    manifest.select(col("file").cast("string"),
      col("member_offset").cast("long"), col("member_length").cast("long"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration()
        // one open handle (plus the file's length for range validation)
        // per distinct file, closed on task completion; a DETERMINISTIC
        // open failure (file absent) is cached too, so a manifest with a
        // million rows against a missing file pays one lookup, not one
        // per row
        val handles = scala.collection.mutable.Map.empty[String,
          Either[String, (org.apache.hadoop.fs.FSDataInputStream, Long)]]
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            handles.values.foreach {
              case Right((h, _)) => scala.util.Try(h.close()): Unit
              case Left(_) => ()
            }))
        def corrupt(f: String, o: Long, l: Long, reason: String) =
          Iterator(WarcGzRecord(f, o, l, None, None, None, None, None,
            None, Some(reason)))
        // GENUINE manifest defects ROUTE as corrupt rows (the member
        // walk's posture): negative/absurd ranges, ranges past the
        // file's length, a file the manifest invents. Everything else
        // — transient I/O (HDFS timeouts, connection resets) —
        // PROPAGATES so Spark retries the task: folding those into
        // corrupt rows would silently drop valid records on the 100 TB
        // ranged-read path whenever the storage layer hiccups.
        def opened(f: String) = handles.getOrElseUpdate(f, {
          val p = new org.apache.hadoop.fs.Path(path, f)
          try {
            val fs = p.getFileSystem(conf)
            val len = fs.getFileStatus(p).getLen
            Right((fs.open(p), len))
          } catch { // deterministic: the manifest names a missing file
            case _: java.io.FileNotFoundException => Left("missing_file")
          }
        })
        def readRange(f: String, o: Long, l: Long): Iterator[WarcGzRecord] =
          if (l <= 0 || l > Int.MaxValue - 8 || o < 0)
            corrupt(f, o, l, "bad_manifest_range")
          else opened(f) match {
            case Left(reason) => corrupt(f, o, l, reason)
            case Right((in, fileLen)) =>
              if (o + l > fileLen) corrupt(f, o, l, "bad_manifest_range")
              else {
                val buf = new Array[Byte](l.toInt)
                // EOF after passing the length pre-check = the file
                // shrank under us (torn rewrite) — a range defect, not a
                // transient; other IOExceptions propagate for task retry
                val read =
                  try { in.readFully(o, buf); true }
                  catch { case _: java.io.EOFException => false }
                if (!read) corrupt(f, o, l, "bad_manifest_range")
                // the slice starts at a member boundary by manifest
                // contract; emitted offsets are rebased to the file
                else walkMembers(f, buf, o, maxMemberBytes)
              }
          }
        // ADJACENT-RANGE COALESCING: manifest rows sorted by (file,
        // offset) — the recommended layout — collapse into ONE positioned
        // read per contiguous run (up to [[MaxCoalescedReadBytes]]), so a
        // dense selection costs sequential I/O instead of one pread per
        // member (at CommonCrawl member sizes the per-call overhead
        // dominates small members). walkMembers tiles the merged buffer
        // back into per-member rows because runs are exactly contiguous;
        // gapped, out-of-order, invalid, or run-overflowing rows fall
        // back to the per-row read. A run whose merged read hits EOF
        // (file truncated underneath us) re-reads row by row so only the
        // genuinely-unreadable members route as corrupt.
        // NOT named `buffered`: inside the anonymous Iterator below,
        // that name would resolve to the class's own inherited
        // `.buffered` member, silently shadowing this val
        val rows = it.buffered
        new Iterator[Iterator[WarcGzRecord]] {
          override def hasNext: Boolean = rows.hasNext
          override def next(): Iterator[WarcGzRecord] = {
            val (f, o, l) = rows.next()
            if (l <= 0 || l > Int.MaxValue - 8 || o < 0) readRange(f, o, l)
            else {
              val run = scala.collection.mutable.ListBuffer((f, o, l))
              var end = o + l
              var ok = true
              while (ok && rows.hasNext) {
                val (f2, o2, l2) = rows.head
                ok = f2 == f && o2 == end && l2 > 0 &&
                  (end - o) + l2 <= MaxCoalescedReadBytes
                if (ok) { rows.next(); run += ((f2, o2, l2)); end += l2 }
              }
              if (run.size == 1) readRange(f, o, l)
              else opened(f) match {
                case Left(_) => run.iterator.flatMap(r =>
                  readRange(r._1, r._2, r._3))
                case Right((in, fileLen)) =>
                  val merged =
                    if (end > fileLen) None
                    else {
                      val buf = new Array[Byte]((end - o).toInt)
                      try { in.readFully(o, buf); Some(buf) }
                      catch { case _: java.io.EOFException => None }
                    }
                  merged match {
                    case Some(buf) => walkMembers(f, buf, o, maxMemberBytes)
                    case None => run.iterator.flatMap(r =>
                      readRange(r._1, r._2, r._3))
                  }
              }
            }
          }
        }.flatten
      }
      .toDF()
  }

  /** Cap on one coalesced ranged read ([[readGzipMembers]]): bounds task
    * memory at buffer + one inflated member while still amortizing the
    * per-call I/O overhead across thousands of typical members. */
  val MaxCoalescedReadBytes: Long = 16L << 20

  /** Walk a buffer of concatenated gzip members starting at a member
    * boundary; never throws — a region that fails to parse becomes ONE
    * corrupt row spanning up to the next PLAUSIBLE gzip member header
    * (`1f 8b 08` with the RFC 1952 reserved FLG bits clear — the magic
    * alone occurs by chance ~once per 20 MB of random bytes; the FLG
    * check rejects 7/8 of those), where the walk resumes. Corrupt-row
    * COUNTS are therefore per resync attempt, not per damaged region: a
    * large garbage region whose bytes happen to contain a plausible
    * header emits one corrupt row per failed resync, never losing data —
    * each row's offset/length tiles the region exactly. `base` rebases
    * emitted offsets (ranged reads pass the slice's file offset). */
  private[graft] def walkMembers(file: String, bytes: Array[Byte],
      base: Long, maxMemberBytes: Int): Iterator[WarcGzRecord] =
    // a TRUE iterator — one decompressed member resident at a time, so a
    // whole-file task never holds the full decoded archive on top of the
    // compressed buffer (a 5:1 file would otherwise cost 6× its size)
    new Iterator[WarcGzRecord] {
      private var off = 0
      override def hasNext: Boolean = off < bytes.length
      override def next(): WarcGzRecord =
        inflateMember(bytes, off, maxMemberBytes) match {
          case Right((data, consumed)) =>
            val rec = parseRecord(file, base + off, consumed.toLong, data)
            off += consumed
            rec
          case Left(reason) =>
            val next = nextMagic(bytes, off + 1)
            val rec = WarcGzRecord(file, base + off, (next - off).toLong,
              None, None, None, None, None, None, Some(reason))
            off = next
            rec
        }
    }

  /** Next offset ≥ `from` holding a PLAUSIBLE gzip member header — the
    * magic (1f 8b 08) followed by a FLG byte with the RFC 1952 reserved
    * bits (5–7) clear — or end of buffer. The FLG validation keeps a
    * chance 3-byte magic inside garbage or compressed data from
    * splitting one damaged region into a cascade of spurious corrupt
    * rows (a candidate that passes and still fails to inflate just
    * becomes the next resync attempt — data is tiled either way). */
  private def nextMagic(b: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    while (i + 3 < b.length &&
      !(b(i) == 0x1f.toByte && b(i + 1) == 0x8b.toByte && b(i + 2) == 8 &&
        (b(i + 3) & 0xe0) == 0))
      i += 1
    if (i + 3 < b.length) i else b.length
  }

  private def readLe32(b: Array[Byte], at: Int): Long =
    (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
      ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)

  /** Inflate ONE gzip member at `off`: manual header parse (FEXTRA/
    * FNAME/FCOMMENT/FHCRC honored), raw-deflate inflate, CRC32 + ISIZE
    * trailer verification. Returns the decompressed bytes and the
    * member's total compressed length, or a corrupt reason — never
    * throws. (GZIPInputStream is unusable here: it silently concatenates
    * adjacent members, destroying the record framing.) */
  private def inflateMember(b: Array[Byte], off: Int,
      maxMemberBytes: Int): Either[String, (Array[Byte], Int)] = {
    try {
      if (off + 10 > b.length || b(off) != 0x1f.toByte ||
        b(off + 1) != 0x8b.toByte) return Left("bad_gzip_member")
      if (b(off + 2) != 8) return Left("bad_gzip_member")
      val flg = b(off + 3) & 0xff
      var p = off + 10
      if ((flg & 4) != 0) { // FEXTRA
        val xlen = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
        p += 2 + xlen
      }
      if ((flg & 8) != 0) { while (b(p) != 0) p += 1; p += 1 } // FNAME
      if ((flg & 16) != 0) { while (b(p) != 0) p += 1; p += 1 } // FCOMMENT
      if ((flg & 2) != 0) p += 2 // FHCRC
      if (p >= b.length) return Left("truncated_gzip_member")
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(b, p, b.length - p)
        val bos = new java.io.ByteArrayOutputStream(8192)
        val buf = new Array[Byte](65536)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
            return Left("truncated_gzip_member")
          if (bos.size() + n > maxMemberBytes)
            return Left("member_too_large")
          bos.write(buf, 0, n)
        }
        val consumed = (b.length - p) - inf.getRemaining
        val trailerAt = p + consumed
        if (trailerAt + 8 > b.length) return Left("truncated_gzip_member")
        val data = bos.toByteArray
        val crc = new java.util.zip.CRC32()
        crc.update(data)
        if (crc.getValue != readLe32(b, trailerAt)) return Left("crc_mismatch")
        if ((data.length & 0xffffffffL) != readLe32(b, trailerAt + 4))
          return Left("isize_mismatch")
        Right((data, trailerAt + 8 - off))
      } finally inf.end()
    } catch {
      case _: java.util.zip.DataFormatException => Left("bad_deflate_stream")
      case _: ArrayIndexOutOfBoundsException => Left("truncated_gzip_member")
    }
  }

  /** Parse one decompressed member: header block (first blank line, CRLF
    * or LF) → fields, then the payload bytes through the charset
    * contract — declared Content-Type charset wins (unsupported name or
    * failed decode routes to corrupt, keeping the declared name in
    * `charset`); no declaration sniffs strict UTF-8 first and falls back
    * to ISO-8859-1 (which cannot fail — every byte is a char). */
  private def parseRecord(file: String, offset: Long, length: Long,
      data: Array[Byte]): WarcGzRecord = {
    import java.nio.charset.StandardCharsets.ISO_8859_1
    def findSplit(): (Int, Int) = { // (header end, payload start)
      var i = 0
      while (i < data.length) {
        if (data(i) == '\n') {
          if (i + 2 < data.length && data(i + 1) == '\r' && data(i + 2) == '\n')
            return (i, i + 3) // \r\n\r\n (i points at first \n)
          if (i + 1 < data.length && data(i + 1) == '\n')
            return (i, i + 2) // \n\n
        }
        i += 1
      }
      (data.length, data.length)
    }
    val (hEnd, pStart) = findSplit()
    val headText = new String(data, 0, hEnd, ISO_8859_1)
    def header(name: String): Option[String] =
      s"(?mi)^$name:[ \\t]*(.*?)[ \\t\\r]*$$".r
        .findFirstMatchIn(headText).map(_.group(1)).filter(_.nonEmpty)
    val url = header("WARC-Target-URI")
    val date = header("WARC-Date")
    val contentType = header("Content-Type")
    val contentLength = header("Content-Length").flatMap(v =>
      scala.util.Try(v.toLong).toOption)
    val declared = contentType.flatMap(ct =>
      "(?i)charset=\"?([A-Za-z0-9_:.+-]+)\"?".r
        .findFirstMatchIn(ct).map(_.group(1)))
    val payloadBytes = java.util.Arrays.copyOfRange(data, pStart, data.length)
    def strictDecode(cs: java.nio.charset.Charset): Option[String] =
      scala.util.Try {
        cs.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
          .decode(java.nio.ByteBuffer.wrap(payloadBytes)).toString
      }.toOption
    val (charset, payload, corrupt) = declared match {
      case Some(name) =>
        scala.util.Try(java.nio.charset.Charset.forName(name)).toOption match {
          case None => (Some(name), None, Some(s"unsupported_charset:$name"))
          case Some(cs) => strictDecode(cs) match {
            case Some(text) => (Some(name), Some(text), None)
            case None => (Some(name), None, Some(s"decode_error:$name"))
          }
        }
      case None =>
        strictDecode(java.nio.charset.StandardCharsets.UTF_8) match {
          case Some(text) => (Some("UTF-8"), Some(text), None)
          case None => // latin-1 is total: every byte maps to a char
            (Some("ISO-8859-1"),
              Some(new String(payloadBytes, ISO_8859_1)), None)
        }
    }
    WarcGzRecord(file, offset, length, url, date, contentType, charset,
      contentLength, payload, corrupt)
  }
}
