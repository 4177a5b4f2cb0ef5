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
      // fan the manifest to ALL cores (hash on file+offset — with only 8
      // files, file-only partitioning would cap parallelism at 8), each
      // task reading its ranges offset-ascending within each file
      val tMember = time(WarcSource.readGzipMembers(spark, dir,
        manifest.repartition(32, col("file"), col("member_offset"))
          .sortWithinPartitions(col("file"), col("member_offset"))))
      emit(f"""{"metric":"warc_scale","mult":$mult,"n_docs":$nDocs,""" +
        f""""n_members":$nMembers,"archive_mb":${bytes / 1e6}%.1f,""" +
        f""""n_part_files":${parts.length},""" +
        f""""read_file_walk_sec":$tFile%.3f,"file_walk_mb_s":${mbs(tFile)}%.1f,""" +
        f""""read_member_ranged_sec":$tMember%.3f,"member_ranged_mb_s":${mbs(tMember)}%.1f,""" +
        f""""member_parallelism_speedup":${tFile / tMember}%.2f}""")

      // corrupt-member overhead: plant a 1 MB garbage region between
      // members of ONE part file (append — boundaries intact, the
      // manifest's ranges stay valid) and re-walk the whole archive
      val victim = parts.minBy(_.getName)
      val garbage = Array.tabulate[Byte](1 << 20)(i => (i * 31 + 7).toByte)
      val fos = new java.io.FileOutputStream(victim, true)
      try fos.write(garbage) finally fos.close()
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
