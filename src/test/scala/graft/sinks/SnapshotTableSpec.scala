package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Manifest-pointer snapshot table: append/read/time-travel/diff, the
  * two-writer interleaving (readers never observe a torn table, losers
  * fold in the winner's commits), and dead-writer claim tolerance.
  */
class SnapshotTableSpec extends SparkSpec {
  import spark.implicits._

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").as[Long].collect().toSet

  test("append → read → time travel → diff") {
    val t = java.nio.file.Files.createTempDirectory("snap1").toString + "/tbl"
    assert(SnapshotTable.latestVersion(spark, t).isEmpty)
    val c1 = SnapshotTable.append((1L to 5L).toDF("id"), t)
    val c2 = SnapshotTable.append((6L to 9L).toDF("id"), t)
    assert((c1.version, c2.version) == (1L, 2L))
    assert(ids(SnapshotTable.read(spark, t)) == (1L to 9L).toSet)
    // a committed snapshot is immutable: v1 still reads exactly batch 1
    assert(ids(SnapshotTable.readVersion(spark, t, 1L)) == (1L to 5L).toSet)
    // CDC: the diff is precisely the second batch, read from its dirs only
    assert(ids(SnapshotTable.diff(spark, t, 1L, 2L)) == (6L to 9L).toSet)
  }

  test("two interleaved writers: no torn reads, the loser folds in the winner") {
    val t = java.nio.file.Files.createTempDirectory("snap2").toString + "/tbl"
    // both writers stage before either commits
    val dirA = SnapshotTable.stageData((1L to 3L).toDF("id"), t)
    val dirB = SnapshotTable.stageData((10L to 12L).toDF("id"), t)
    // staged data is invisible — there is still no committed version
    intercept[IllegalArgumentException] { SnapshotTable.read(spark, t) }
    // A commits first
    val cA = SnapshotTable.commitStaged(spark, t, dirA)
    assert(cA.version == 1L)
    assert(ids(SnapshotTable.read(spark, t)) == Set(1L, 2L, 3L))
    // a THIRD writer wins the race for v2 while B is between resolve and
    // claim (hand-played interleaving: C's complete manifest appears
    // before B claims)
    val dirC = SnapshotTable.stageData((20L to 21L).toDF("id"), t)
    SnapshotTable.commitStaged(spark, t, dirC) // v2 = A + C
    val cB = SnapshotTable.commitStaged(spark, t, dirB)
    assert(cB.version == 3L, "loser must retry at the next version")
    // nobody's rows were lost by the race
    assert(ids(SnapshotTable.read(spark, t)) ==
      (Set(1L, 2L, 3L) ++ Set(10L, 11L, 12L) ++ Set(20L, 21L)))
    // intermediate snapshots remain exactly as committed
    assert(ids(SnapshotTable.readVersion(spark, t, 2L)) ==
      Set(1L, 2L, 3L, 20L, 21L))
  }

  test("compact rewrites the snapshot, folds in a concurrent append, and expire reclaims") {
    val t = java.nio.file.Files.createTempDirectory("snap4").toString + "/tbl"
    SnapshotTable.append((1L to 4L).toDF("id"), t)   // v1
    SnapshotTable.append((5L to 8L).toDF("id"), t)   // v2
    // hand-play the race: the maintainer resolves v2 and stages its
    // compacted rewrite; an appender commits v3 BEFORE the maintainer's
    // replacing commit — commitReplacing must fold v3's dir in, not
    // drop it (the dirs it replaces are exactly v2's)
    val compacted = SnapshotTable.stageData(
      SnapshotTable.readVersion(spark, t, 2L), t)
    val dirC = SnapshotTable.stageData((100L to 101L).toDF("id"), t)
    SnapshotTable.commitStaged(spark, t, dirC)       // v3 (concurrent append)
    val c = SnapshotTable.commitReplacing(spark, t, Seq(compacted),
      replacedDirsOf(t, 2L))
    assert(c.version == 4L)
    assert(ids(SnapshotTable.read(spark, t)) == ((1L to 8L) ++ Seq(100L, 101L)).toSet,
      "replacing commit lost rows or dropped the concurrent append")
    // pre-compaction versions still read exactly as committed
    assert(ids(SnapshotTable.readVersion(spark, t, 2L)) == (1L to 8L).toSet)
    // retention: drop v1..v3 — their exclusive dirs go, v4's stay
    SnapshotTable.expire(spark, t, keepFrom = 4L)
    assert(SnapshotTable.latestVersion(spark, t).contains(4L))
    assert(ids(SnapshotTable.read(spark, t)) == ((1L to 8L) ++ Seq(100L, 101L)).toSet)
    intercept[IllegalArgumentException] { SnapshotTable.readVersion(spark, t, 2L) }
    // the replaced data dirs are physically gone; the survivors are the
    // compacted dir + v3's concurrent-append dir
    val dataDirs = new java.io.File(s"$t/data").listFiles().map(_.getName).toSet
    assert(dataDirs.size == 2,
      s"expire left unreferenced dirs (or deleted referenced ones): $dataDirs")
    // diff still works on post-compaction append-only versions
    SnapshotTable.append((200L to 201L).toDF("id"), t) // v5
    assert(ids(SnapshotTable.diff(spark, t, 4L, 5L)) == Set(200L, 201L))
    // and refuses across the compaction boundary (v3 dirs ⊄ v4)
    intercept[IllegalArgumentException] {
      SnapshotTable.diff(spark, t, 3L, 4L)
    }
  }

  /** The data dirs version `v`'s manifest lists (test-side mirror;
    * strips optional tab-separated idempotency keys). */
  private def replacedDirsOf(t: String, v: Long): Set[String] =
    scala.io.Source.fromFile(s"$t/manifests/v$v.manifest").getLines()
      .filterNot(_ == "END").map(_.split("\t")(0)).toSet

  test("plain compact() on the latest snapshot preserves rows and layout count") {
    val t = java.nio.file.Files.createTempDirectory("snap5").toString + "/tbl"
    SnapshotTable.append((1L to 50L).toDF("id"), t)
    SnapshotTable.append((51L to 90L).toDF("id"), t)
    val c = SnapshotTable.compact(spark, t)
    assert(c.version == 3L)
    assert(ids(SnapshotTable.read(spark, t)) == (1L to 90L).toSet)
  }

  test("idempotency keys: re-delivery is a no-op, and compaction preserves load history") {
    val t = java.nio.file.Files.createTempDirectory("snap6").toString + "/tbl"
    val c1 = SnapshotTable.append((1L to 4L).toDF("id"), t, idempotencyKey = "batch-A")
    val c2 = SnapshotTable.append((5L to 8L).toDF("id"), t, idempotencyKey = "batch-B")
    assert((c1.version, c2.version) == (1L, 2L))
    // same key again — with different data, even: the commit is a no-op
    val replay = SnapshotTable.append((999L to 1000L).toDF("id"), t,
      idempotencyKey = "batch-A")
    assert(replay.version == 2L, "re-delivered key created a new version")
    assert(ids(SnapshotTable.read(spark, t)) == (1L to 8L).toSet)
    // compaction rewrites the dirs but must carry the keys forward
    SnapshotTable.compact(spark, t)
    val replay2 = SnapshotTable.append((999L to 1000L).toDF("id"), t,
      idempotencyKey = "batch-B")
    assert(ids(SnapshotTable.read(spark, t)) == (1L to 8L).toSet,
      "compaction dropped load history — a re-delivered batch re-loaded")
    assert(replay2.version == SnapshotTable.latestVersion(spark, t).get)
    // a genuinely new key still appends
    SnapshotTable.append((9L to 10L).toDF("id"), t, idempotencyKey = "batch-C")
    assert(ids(SnapshotTable.read(spark, t)) == (1L to 10L).toSet)
  }

  test("REAL concurrency: racing writer threads never lose a successful commit") {
    val t = java.nio.file.Files.createTempDirectory("snap7").toString + "/tbl"
    // stage everything up front (Spark jobs aren't the subject); then race
    // the COMMIT protocol itself from many threads
    val staged = (0 until 12).map { i =>
      i -> SnapshotTable.stageData(Seq(i.toLong).toDF("id"), t)
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    try {
      val futures = staged.map { case (i, dir) =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long =
            SnapshotTable.commitStaged(spark, t, dir, maxAttempts = 200).version
        })
      }
      val versions = futures.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
      // every commit that returned success is in the final snapshot —
      // the invariant the r7 review's lost-update race violated
      assert(ids(SnapshotTable.read(spark, t)) == (0L until 12L).toSet,
        "a successfully-committed writer's rows are missing")
      // commits serialized: 12 distinct versions, and each version v's
      // snapshot is a strict superset of v-1's
      assert(versions.toSet.size == 12)
      val sorted = versions.sorted
      assert(sorted == (1L to 12L), s"non-contiguous versions: $sorted")
      (2L to 12L).foreach { v =>
        val prev = ids(SnapshotTable.readVersion(spark, t, v - 1))
        val cur = ids(SnapshotTable.readVersion(spark, t, v))
        assert(prev.subsetOf(cur), s"v$v dropped rows committed at v${v - 1}")
      }
    } finally pool.shutdownNow()
  }

  test("a dead claimant's lock is lease-broken; a live one is waited out, never leapfrogged") {
    val t = java.nio.file.Files.createTempDirectory("snap8").toString + "/tbl"
    SnapshotTable.append((1L to 3L).toDF("id"), t) // v1
    // a writer died between claim and rename: orphaned lock for v2
    new java.io.File(s"$t/manifests").mkdirs()
    val lock = new java.io.File(s"$t/manifests/.v2.lock")
    lock.createNewFile()
    lock.setLastModified(System.currentTimeMillis() - 10000L)
    val oldLease = SnapshotTable.lockLeaseMs
    SnapshotTable.lockLeaseMs = 1000L // the 10 s-old lock is dead
    try {
      val c = SnapshotTable.append((4L to 5L).toDF("id"), t)
      assert(c.version == 2L, "dead claim must be lease-broken, not leapfrogged")
      assert(ids(SnapshotTable.read(spark, t)) == (1L to 5L).toSet)
    } finally SnapshotTable.lockLeaseMs = oldLease
  }

  test("zone-map skipping: ranged reads scan only matching commit dirs, results exact") {
    val t = java.nio.file.Files.createTempDirectory("snap_zm").toString + "/tbl"
    // one commit per day shard, ISO dates (fixed width ⇒ lexical ==
    // chronological), plus one stats-less commit that must stay scanned
    (1 to 8).foreach { d =>
      val day = f"2024-01-0$d"
      SnapshotTable.appendWithStats(
        Seq((d.toLong, day), (d + 100L, day)).toDF("id", "day"),
        t, statsCols = Seq("day"))
    }
    SnapshotTable.append(Seq((999L, "2024-01-03")).toDF("id", "day"), t)
    val (df, scanned, total) = SnapshotTable.readWhere(spark, t, "day",
      "2024-01-03", "2024-01-05")
    assert(total == 9)
    assert(scanned == 4, // days 3,4,5 + the sidecar-less commit
      s"zone map scanned $scanned of $total dirs")
    // results identical to the full-scan filter (zone maps prune, never decide)
    val expect = SnapshotTable.read(spark, t)
      .where(col("day").between("2024-01-03", "2024-01-05"))
      .select("id").as[Long].collect().toSet
    assert(df.select("id").as[Long].collect().toSet == expect)
    assert(expect == Set(3L, 103L, 4L, 104L, 5L, 105L, 999L))
  }

  test("randomized op sequences: table state always equals the model") {
    for (seed <- Seq(11, 42, 97)) {
      val rnd = new scala.util.Random(seed)
      val t = java.nio.file.Files.createTempDirectory(s"snap_rnd$seed")
        .toString + "/tbl"
      var model = Set.empty[Long]
      var keys = Vector.empty[String]
      var nextId = 0L
      def freshBatch(): Seq[Long] = {
        val n = rnd.nextInt(4) + 1
        val ids = (nextId until nextId + n); nextId += n; ids
      }
      for (step <- 0 until 14) {
        rnd.nextInt(5) match {
          case 0 | 1 => // plain append
            val ids = freshBatch()
            SnapshotTable.append(ids.toDF("id"), t)
            model ++= ids
          case 2 => // keyed append with a NEW key
            val ids = freshBatch()
            val k = s"k$step"
            SnapshotTable.append(ids.toDF("id"), t, idempotencyKey = k)
            keys :+= k; model ++= ids
          case 3 if keys.nonEmpty => // re-delivered key: must be a no-op
            SnapshotTable.append(freshBatch().toDF("id"), t,
              idempotencyKey = keys(rnd.nextInt(keys.size)))
          case 4 if model.nonEmpty => // maintenance mid-stream
            SnapshotTable.compact(spark, t, numFiles = rnd.nextInt(2) + 1)
          case _ => ()
        }
        if (model.nonEmpty)
          assert(ids(SnapshotTable.read(spark, t)) == model,
            s"seed=$seed step=$step diverged from the model")
      }
      if (model.nonEmpty) {
        // retention to the latest snapshot must not change what readers see
        SnapshotTable.expire(spark, t,
          SnapshotTable.latestVersion(spark, t).get)
        assert(ids(SnapshotTable.read(spark, t)) == model,
          s"seed=$seed: expire changed the latest snapshot")
      }
    }
  }

  test("a dead writer's footerless claim is skipped by readers and leapt by writers") {
    val t = java.nio.file.Files.createTempDirectory("snap3").toString + "/tbl"
    SnapshotTable.append((1L to 4L).toDF("id"), t)
    // simulate a writer that claimed v2 and died before the footer
    val dead = new java.io.PrintWriter(s"$t/manifests/v2.manifest")
    dead.println("data/never-finished"); dead.close()
    // readers resolve the last COMPLETE snapshot
    assert(SnapshotTable.latestVersion(spark, t).contains(1L))
    assert(ids(SnapshotTable.read(spark, t)) == (1L to 4L).toSet)
    // the next writer claims PAST the corpse, never colliding with it
    val c = SnapshotTable.append((5L to 6L).toDF("id"), t)
    assert(c.version == 3L)
    assert(ids(SnapshotTable.read(spark, t)) == (1L to 6L).toSet)
  }
}
