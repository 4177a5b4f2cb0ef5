package graft.sinks

import java.net.URI

import graft.SparkSpec
import graft.etl.{Pipeline, StockEtl}
import graft.sources.{CsvBarSource, HtmlTableConstituentSource}
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A Hadoop FileSystem registered under its own non-`file` scheme,
  * delegating storage to the local disk but recording every mutating
  * call — the test double for the reference's S3 stage/warehouse
  * (S5, `dags/sp500_dag.py.py:278-293`). Any sink code that bypasses the
  * Hadoop FS contract (`java.io.File`, hardcoded `file://` handling)
  * cannot see `mockstore://` paths at all, so a green run here proves the
  * whole stage → load → purge path goes through the pluggable FS API that
  * s3a/abfs/gcs implement in production.
  */
class MockStoreFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mockstore"
  override def getUri: URI = URI.create("mockstore:///")

  override def delete(p: Path, recursive: Boolean): Boolean = {
    val bare = Path.getPathWithoutSchemeAndAuthority(p).toString
    MockStoreFileSystem.ops.synchronized {
      MockStoreFileSystem.ops += (("delete", bare))
    }
    MockStoreFileSystem.maybeCrash("delete", bare)
    super.delete(p, recursive)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    val bare = Path.getPathWithoutSchemeAndAuthority(dst).toString
    MockStoreFileSystem.ops.synchronized {
      MockStoreFileSystem.ops += (("rename", bare))
    }
    MockStoreFileSystem.maybeCrash("rename", bare)
    super.rename(src, dst)
  }
}

object MockStoreFileSystem {
  val ops = scala.collection.mutable.ListBuffer.empty[(String, String)]

  /** Crash injection for the torture specs ([[CrashConsistencySpec]]):
    * when armed with (op, destination-path substring), the FIRST matching
    * mutating call throws BEFORE performing the operation — the process
    * "dies" at exactly that point in the sink protocol — and the trap
    * disarms so the recovery re-run proceeds normally.
    */
  @volatile private var trap: Option[(String, String)] = None

  /** Arm the crash for the first `op` whose destination path matches
    * `pattern`: a plain substring, or — with a trailing `$` — an
    * end-of-path anchor (needed when every path in a protocol shares a
    * prefix and only the final rename's exact destination distinguishes
    * the window under test).
    */
  def armCrash(op: String, pattern: String): Unit =
    trap = Some((op, pattern))
  def disarm(): Unit = trap = None
  private def matches(path: String, pattern: String): Boolean =
    if (pattern.endsWith("$")) path.endsWith(pattern.dropRight(1))
    else path.contains(pattern)
  private[sinks] def maybeCrash(op: String, path: String): Unit =
    trap.foreach { case (tOp, tPat) =>
      if (tOp == op && matches(path, tPat)) {
        trap = None
        throw new java.io.IOException(
          s"injected crash before $op of $path")
      }
    }
}

class ObjectStoreSpec extends SparkSpec {

  private val fixtureHtml =
    """<html><body><table class="wikitable">
      |<tr><th>Symbol</th><th>Security</th></tr>
      |<tr><td>AAA</td><td>Alpha Corp</td></tr>
      |<tr><td>BBB</td><td>Beta Inc</td></tr>
      |</table></body></html>""".stripMargin

  test("S5: stage, load, and consume-once purge through a non-file Hadoop FS scheme") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockstore.impl", classOf[MockStoreFileSystem].getName)
    val tmp = java.nio.file.Files.createTempDirectory("mockstore").toString
    val f = new java.io.PrintWriter(s"$tmp/bars.csv")
    f.println("Date,Symbol,Open,High,Low,Close,AdjClose,Volume")
    f.println("2024-01-02,AAA,10.00,12.00,9.00,10.00,10.00,100")
    f.println("2024-01-03,AAA,10.50,13.00,10.00,11.00,11.00,110")
    f.println("2024-01-02,BBB,5.00,5.50,4.50,5.00,5.00,50")
    f.close()
    MockStoreFileSystem.ops.synchronized(MockStoreFileSystem.ops.clear())

    val report = Pipeline.run(spark,
      new HtmlTableConstituentSource(() => fixtureHtml),
      new CsvBarSource(s"$tmp/bars.csv"),
      java.sql.Date.valueOf("2024-01-01"), java.sql.Date.valueOf("2024-01-31"),
      stageDir = s"mockstore://$tmp/stage",
      warehouseDir = s"mockstore://$tmp/warehouse")
    assert(report.loadedRows == 3L)

    // the staged CSVs were purged via the FS contract: a delete of a .csv
    // under the stage path was issued against THIS filesystem instance
    val ops = MockStoreFileSystem.ops.synchronized(MockStoreFileSystem.ops.toList)
    assert(ops.exists { case (op, p) =>
      op == "delete" && p.startsWith(s"$tmp/stage") && p.endsWith(".csv")
    }, s"no csv purge through mockstore fs; saw: $ops")
    // and nothing .csv survives under the stage dir on the backing store
    val staged = Option(new java.io.File(s"$tmp/stage").listFiles())
      .getOrElse(Array.empty).map(_.getName)
    assert(!staged.exists(_.endsWith(".csv")), s"stage not purged: ${staged.toSeq}")

    // the warehouse is readable back through the same scheme and verifies
    val v = WarehouseLoad.verify(spark, s"mockstore://$tmp/warehouse")
    assert(v.getAs[Long]("total_rows") == 3L)
    assert(v.getAs[Long]("unique_symbols") == 2L)

    // re-ingest appends (warehouse is append-only, like COPY INTO)
    val tmp2 = java.nio.file.Files.createTempDirectory("mockstore2").toString
    val g = new java.io.PrintWriter(s"$tmp2/bars.csv")
    g.println("Date,Symbol,Open,High,Low,Close,AdjClose,Volume")
    g.println("2024-02-02,AAA,11.00,12.00,9.00,10.00,10.00,100")
    g.close()
    Pipeline.run(spark,
      new HtmlTableConstituentSource(() => fixtureHtml),
      new CsvBarSource(s"$tmp2/bars.csv"),
      java.sql.Date.valueOf("2024-02-01"), java.sql.Date.valueOf("2024-02-28"),
      stageDir = s"mockstore://$tmp2/stage",
      warehouseDir = s"mockstore://$tmp/warehouse")
    assert(WarehouseLoad.verify(spark, s"mockstore://$tmp/warehouse")
      .getAs[Long]("total_rows") == 4L)
  }
}
