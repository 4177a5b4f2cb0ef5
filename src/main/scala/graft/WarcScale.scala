package graft

import org.apache.spark.sql.functions._

/** Gzip-member WARC throughput study (r11 verdict item #4): the only
  * front-door path with no MB/s evidence is the one that reads 100 TB
  * first. Measures, per decade (x10 / x100 of the sf0.1 document shape):
  *
  *  - `readGzip` — whole-file member walk (per-FILE parallelism): the
  *    archive is deliberately written as FEW part files (8), the
  *    CommonCrawl shape where per-file parallelism is the bottleneck;
  *  - `readGzipMembers` — manifest-driven positioned range reads
  *    fanned to all cores (per-MEMBER parallelism): the 100 TB path;
  *    the speedup over the whole-file walk IS the claim the scaladoc
  *    makes, measured;
  *  - corrupt-member overhead: a garbage region planted mid-archive
  *    (between members, the damaged-region shape) — the walk's
  *    route-and-resume must cost noise, not a rescan.
  *
  * MB/s figures are COMPRESSED archive bytes per second (the unit a
  * 100 TB capacity plan divides by). One JSON line per cell plus a
  * summary line; SCALING.md holds the reading.
  *
  * Usage: `runMain graft.WarcScale <workDir> <mults>` (e.g. `/tmp/w 10,100`).
  */
object WarcScale {
  def main(args: Array[String]): Unit = {
    val workDir = if (args.nonEmpty) args(0) else "/tmp/graft_r12/warc"
    val mults = (if (args.length > 1) args(1) else "10,100")
      .split(",").map(_.trim.toInt)
    val spark = StudySession.build()
    import graft.sources.WarcSource
    val rows = scala.collection.mutable.ListBuffer.empty[String]
    def emit(s: String): Unit = { println(s); rows += s }

    mults.foreach { mult =>
      val dir = s"$workDir/x$mult"
      val nDocs = 5000L * mult
      // 8 part files regardless of scale: fixed per-file parallelism,
      // growing per-member parallelism — exactly the asymmetry the
      // manifest path exists to exploit
      WarcSource.writeGzip(
        ScaleFixture.documents(spark, nDocs).repartition(8),
        "doc_id", "text", "source", dir)
      val parts = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".warc.gz"))
      val bytes = parts.map(_.length()).sum
      val manifest = WarcSource.memberManifest(spark, dir)
      val nMembers = manifest.count()

      def time(build: => org.apache.spark.sql.DataFrame): Double = {
        def once(): Double = {
          spark.sqlContext.clearCache(); System.gc()
          val t0 = System.nanoTime()
          build.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once() // warmup
        (1 to 2).map(_ => once()).min
      }
      def mbs(sec: Double): Double = bytes / 1e6 / sec

      val tFile = time(WarcSource.readGzip(spark, dir))
      // fan the manifest to ALL cores with RANGE partitioning on
      // (file, offset): every partition holds a contiguous slice of one
      // or two files, so the reader's adjacent-range coalescing turns
      // each task into a handful of sequential reads (hash partitioning
      // was measured here first: it interleaves neighbors across tasks,
      // defeats coalescing, and ran 2.5x slower than the file walk)
      val tMember = time(WarcSource.readGzipMembers(spark, dir,
        manifest.repartitionByRange(32, col("file"), col("member_offset"))
          .sortWithinPartitions(col("file"), col("member_offset"))))
      // THE manifest-path claim: selecting a sparse member subset (2%)
      // via positioned range reads vs walking the whole archive and
      // filtering — record-level pruning is what turns a 100 TB archive
      // into a read of only the bytes asked for
      val sel = xxhash64(col("file"), col("member_offset")) % 50 === 0
      val tPruned = time(WarcSource.readGzipMembers(spark, dir,
        manifest.where(sel)
          .repartitionByRange(32, col("file"), col("member_offset"))
          .sortWithinPartitions(col("file"), col("member_offset"))))
      val tWalkFiltered = time(WarcSource.readGzip(spark, dir)
        .where(xxhash64(col("file"), col("member_offset")) % 50 === 0))
      emit(f"""{"metric":"warc_scale","mult":$mult,"n_docs":$nDocs,""" +
        f""""n_members":$nMembers,"archive_mb":${bytes / 1e6}%.1f,""" +
        f""""n_part_files":${parts.length},""" +
        f""""read_file_walk_sec":$tFile%.3f,"file_walk_mb_s":${mbs(tFile)}%.1f,""" +
        f""""read_member_ranged_sec":$tMember%.3f,"member_ranged_mb_s":${mbs(tMember)}%.1f,""" +
        f""""member_parallelism_speedup":${tFile / tMember}%.2f,""" +
        f""""pruned_2pct_ranged_sec":$tPruned%.3f,""" +
        f""""pruned_2pct_walk_filter_sec":$tWalkFiltered%.3f,""" +
        f""""pruning_speedup":${tWalkFiltered / tPruned}%.2f}""")

      // corrupt-member overhead: plant a NEW part file holding a 1 MB
      // garbage region followed by one valid member (mutating an
      // already-listed part in place trips Spark's file-changed check —
      // FAILED_READ_FILE — which is the engine's correct response, not
      // ours to bypass) and re-walk the whole archive: the walk must
      // route the region, resume on the trailing member, and cost noise
      val garbage = Array.tabulate[Byte](1 << 20)(i => (i * 31 + 7).toByte)
      val trailing = graft.sources.WarcSource.gzipMember(
        Seq("WARC-Target-URI" -> "http://pl.example/doc/999999999",
          "Content-Type" -> "text/plain; charset=UTF-8"),
        "resumed after garbage".getBytes("UTF-8"))
      java.nio.file.Files.write(
        new java.io.File(dir, "part-zz-garbage.warc.gz").toPath,
        garbage ++ trailing)
      val tCorrupt = time(WarcSource.readGzip(spark, dir))
      val nCorrupt = WarcSource.readGzip(spark, dir)
        .where(col("corrupt_reason").isNotNull).count()
      emit(f"""{"metric":"warc_scale_corrupt","mult":$mult,""" +
        f""""garbage_mb":1.0,"corrupt_rows":$nCorrupt,""" +
        f""""read_sec":$tCorrupt%.3f,"overhead_vs_clean":${tCorrupt / tFile}%.2f}""")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT",
        "SCALING_R12_WARC.json")),
      rows.map(r => " " + r).mkString(
        "{\"metric\":\"warc_scale_study\",\"rows\":[\n", ",\n", "\n]}\n"))
    spark.stop()
  }
}
