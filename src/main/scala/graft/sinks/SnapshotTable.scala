package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** ACID-ish multi-writer APPEND over a plain Hadoop filesystem — snapshot
  * isolation from a manifest-pointer commit, no table-format dependency
  * (r6 verdict item 5; the reference's Snowflake target gets this
  * implicitly, DAG:348–378).
  *
  * Layout:
  * {{{
  *   table/data/<commit-uuid>/part-*.parquet   writer-private until committed
  *   table/manifests/v<N>.manifest             the snapshot pointer files
  * }}}
  *
  * A manifest is SELF-CONTAINED: every data directory visible at that
  * version, one per line, closed by an `END` footer. Readers resolve the
  * highest footer-complete manifest and read exactly its directories —
  * so a reader never sees a torn table: staged-but-uncommitted data dirs
  * are invisible (nothing points at them), a half-written manifest has
  * no footer and is skipped, and an already-resolved version N stays
  * byte-stable forever (append-only data dirs are never rewritten) —
  * that is the snapshot-isolation guarantee, and what makes time travel
  * ([[readVersion]]) and incremental diffs ([[diff]]) free.
  *
  * Commit protocol (optimistic, lock-free — the table-format pattern):
  *  1. stage: write the batch to `data/<uuid>/` — private, invisible;
  *  2. resolve the latest COMPLETE manifest (version B), build the full
  *     line list `its lines + ours` in a hidden temp file
  *     (`manifests/.tmp-<uuid>`);
  *  3. PUBLISH: claim `B+1` via create-if-absent of a hidden lock file
  *     (the atomic primitive — HDFS NameNode, conditional PUT on object
  *     stores), rename the complete temp file onto `v(B+1).manifest`,
  *     drop the lock.
  * The claim is the COMMIT POINT, and because the manifest file is
  * complete BEFORE it becomes visible, readers never observe an
  * in-flight commit (the defect of a create-then-stream claim, caught
  * in the r7 review: a slow writer's visible-but-footerless claim was
  * leapfrogged and its rows silently dropped from every later
  * snapshot). A claim LOSER re-resolves — the winner's manifest appears
  * within milliseconds, bringing its lines along — and retries the next
  * version, so concurrent commits serialize without losing each other;
  * a live claim is never leapfrogged, and a claim whose manifest never
  * appears is lease-broken after [[lockLeaseMs]] (the holder died
  * between claim and rename; it never returned success, so nothing is
  * lost). A writer that dies elsewhere leaves only a hidden `.tmp-`
  * file and an unreferenced staged dir — garbage, never corruption. A
  * footerless `v*.manifest` can only be debris from a store violating
  * the rename contract; readers still skip it and writers version past
  * it.
  *
  * Scale shape: the manifest carries one LINE per commit (directory
  * paths, not file lists), so resolve cost is O(commits), independent of
  * data volume; [[diff]] reads ONLY the data dirs added between two
  * versions — change-data-capture at O(added bytes) with zero shuffle
  * and no row-level anti-join.
  */
object SnapshotTable {

  final case class Commit(version: Long, dataDir: String)

  private val Footer = "END"
  private val ManifestName = """v(\d+)\.manifest""".r

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Stage a batch into a writer-private data directory (invisible to
    * readers until a manifest points at it). Returns the dir, relative
    * to the table root. */
  private[graft] def stageData(df: DataFrame, table: String): String = {
    val rel = s"data/${java.util.UUID.randomUUID}"
    df.write.mode(SaveMode.ErrorIfExists).parquet(s"$table/$rel")
    rel
  }

  /** All footer-COMPLETE manifest versions, ascending. */
  private def committedVersions(spark: SparkSession, table: String): Seq[Long] = {
    val dir = new org.apache.hadoop.fs.Path(s"$table/manifests")
    val f = fs(spark, table)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).iterator.flatMap(st => st.getPath.getName match {
      case ManifestName(n) if readManifest(spark, table, n.toLong).isDefined =>
        Some(n.toLong)
      case _ => None
    }).toSeq.sorted
  }

  /** Every version with a PUBLISHED manifest file (complete, or debris
    * from a rename-contract-violating store) — writers version past
    * these. Lock files are deliberately NOT counted: an in-flight claim
    * must be waited out or lease-broken ([[publish]]), never leapfrogged
    * — leapfrogging a live claim is exactly the lost-update race the
    * atomic-publish rework removed. */
  private def claimedVersions(spark: SparkSession, table: String): Seq[Long] = {
    val dir = new org.apache.hadoop.fs.Path(s"$table/manifests")
    val f = fs(spark, table)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).iterator.flatMap(_.getPath.getName match {
      case ManifestName(n) => Some(n.toLong)
      case _ => None
    }).toSeq.sorted
  }

  /** A manifest line: the data dir plus an optional writer-supplied
    * idempotency key (tab-separated — old single-field manifests parse
    * with an empty key). */
  private def parseLine(l: String): (String, String) =
    l.indexOf('\t') match {
      case -1 => (l, "")
      case i  => (l.substring(0, i), l.substring(i + 1))
    }

  /** The data dirs of manifest `version`, or None if absent/footerless.
    * Distinct: a dir may legally carry several idempotency-key lines
    * after a compaction folded multiple keyed commits into one rewrite. */
  private def readManifest(spark: SparkSession, table: String,
      version: Long): Option[Seq[String]] =
    readManifestLines(spark, table, version).map(_.map(_._1).distinct)

  /** (dir, idempotencyKey) pairs of manifest `version`. */
  private def readManifestLines(spark: SparkSession, table: String,
      version: Long): Option[Seq[(String, String)]] = {
    val p = new org.apache.hadoop.fs.Path(s"$table/manifests/v$version.manifest")
    val f = fs(spark, table)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val text = try {
        val src = scala.io.Source.fromInputStream(in, "UTF-8")
        try src.getLines().toVector finally src.close()
      } finally in.close()
      if (text.lastOption.contains(Footer)) Some(text.dropRight(1).map(parseLine))
      else None // in-progress or dead writer's claim — not a snapshot
    }
  }

  /** Latest complete version: walk version numbers DESCENDING and stop at
    * the first footer-complete manifest — one listing + (normally) one
    * manifest read, not a read of every manifest ever committed (the r7
    * review's O(commits²) finding). */
  def latestVersion(spark: SparkSession, table: String): Option[Long] =
    claimedVersions(spark, table).reverseIterator
      .find(readManifest(spark, table, _).isDefined)

  private def renderLine(dir: String, key: String): String =
    if (key.isEmpty) dir else s"$dir\t$key"

  /** The version to publish against base `latest`: `latest + 1`, bumped
    * past any footerless DEBRIS manifests sitting directly above it (a
    * rename-contract-violating store's leftovers — skipping them is safe
    * only because no COMPLETE manifest lies between the base and the
    * chosen slot). Critically this derives from the SAME resolve as the
    * base — the earlier max(latest, claimedMax)+1 used a second, later
    * listing, so a writer whose base read narrowly preceded a winner's
    * publish would compute the winner's version + 1 and slide past its
    * own collision, dropping the winner's lines (the threaded spec
    * caught the lost commit). */
  private def nextVersionFor(spark: SparkSession, table: String,
      latest: Option[Long]): Long = {
    val f = fs(spark, table)
    var next = latest.getOrElse(0L) + 1
    while (f.exists(new org.apache.hadoop.fs.Path(
        s"$table/manifests/v$next.manifest")) &&
      readManifest(spark, table, next).isEmpty)
      next += 1 // debris slot; base unchanged — nothing complete between
    next
  }

  /** A claim older than this is a dead writer's and may be lease-broken
    * by the next claimant. Writers hold the lock only between claim and
    * rename — milliseconds — so the default is ~four orders of magnitude
    * of headroom; tests shrink it to exercise the breaker. */
  @volatile private[graft] var lockLeaseMs: Long = 60000L

  /** Atomic publish of version `version`:
    *  1. the full manifest content lands in a hidden temp file;
    *  2. the version is CLAIMED by create-if-absent of
    *     `.v<version>.lock` — the atomic primitive (HDFS NameNode;
    *     conditional PUT on object stores), one winner per version;
    *  3. the owner renames its complete temp file onto
    *     `v<version>.manifest` (nobody else can — they hold no lock)
    *     and removes the lock.
    * Readers never see the lock or the temp; the manifest appears
    * complete-or-not-at-all. A lock is never LEAPFROGGED (skipping a
    * live claim is the lost-update race): a claimant finding the lock
    * held returns false and the caller retries THE SAME version after a
    * short wait — either the holder's manifest appears (base advances)
    * or, past [[lockLeaseMs]], the holder is declared dead and its lock
    * broken; a dead writer never returned success, so nothing is lost.
    * A read-back verifies the published bytes are ours — belt-and-braces
    * for stores whose create-if-absent is merely check-then-create (the
    * local test double). Returns false — temp cleaned up — when the
    * claim was not won. */
  private def publish(spark: SparkSession, table: String, version: Long,
      content: String): Boolean = {
    val f = fs(spark, table)
    val dst = new org.apache.hadoop.fs.Path(s"$table/manifests/v$version.manifest")
    val lock = new org.apache.hadoop.fs.Path(s"$table/manifests/.v$version.lock")
    val tmp = new org.apache.hadoop.fs.Path(
      s"$table/manifests/.tmp-${java.util.UUID.randomUUID}")
    val out = f.create(tmp, false)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    // The claim MUST be atomic create-if-absent. Hadoop's local
    // filesystems implement create(overwrite=false) as check-then-create
    // — two same-box writers can both pass the check (the threaded spec
    // caught exactly that, losing a commit) — so locally the claim goes
    // through NIO createFile (O_CREAT|O_EXCL, kernel-atomic). HDFS's
    // create is NameNode-atomic as-is; object stores use conditional PUT.
    def tryClaim(): Boolean = f match {
      case _: org.apache.hadoop.fs.RawLocalFileSystem |
           _: org.apache.hadoop.fs.LocalFileSystem =>
        try {
          java.nio.file.Files.createFile(java.nio.file.Paths.get(
            org.apache.hadoop.fs.Path
              .getPathWithoutSchemeAndAuthority(lock).toString))
          true
        } catch { case _: java.io.IOException => false }
      case _ =>
        try { f.create(lock, false).close(); true }
        catch { case _: java.io.IOException => false }
    }
    val claimed = !f.exists(dst) && {
      tryClaim() || {
        // lease-break a DEAD claimant (claim-to-rename is milliseconds;
        // a lock past the lease can only be a crashed writer's)
        val stale = try {
          System.currentTimeMillis() -
            f.getFileStatus(lock).getModificationTime > lockLeaseMs
        } catch { case _: java.io.IOException => false /* holder finished */ }
        stale && f.delete(lock, false) && tryClaim()
      }
    }
    // Re-check the destination UNDER the lock: the pre-check races with a
    // winner who renamed and released between our check and our claim —
    // renaming now would OVERWRITE its published manifest on stores whose
    // rename replaces (the threaded spec caught the lost commit). Only
    // the lock holder renames, and only after seeing dst absent while
    // holding the lock, so no publish can clobber another.
    val won = claimed && !f.exists(dst) &&
      (try f.rename(tmp, dst) catch { case _: java.io.IOException => false })
    if (!won) {
      if (claimed) f.delete(lock, false) // back off; the version is taken
      f.delete(tmp, false)
      return false
    }
    f.delete(lock, false)
    val back = {
      val in = f.open(dst)
      try {
        val src = scala.io.Source.fromInputStream(in, "UTF-8")
        try src.mkString finally src.close()
      } finally in.close()
    }
    back == content
  }

  /** Commit an already-staged data dir: build the next manifest from the
    * latest complete snapshot's lines + ours, and atomically [[publish]]
    * it one version up — retrying from a fresh resolve when a concurrent
    * winner takes the version (their lines fold in on the retry).
    * A non-empty `idempotencyKey` makes the commit EXACTLY-ONCE under
    * re-runs (the COPY INTO load-history pattern): if the latest
    * snapshot already carries a line with the key, the staged dir is NOT
    * committed again — the existing version is returned (the caller's
    * orphaned re-staged dir stays unreferenced, garbage not corruption).
    * Exposed at this grain so the concurrency spec can drive exact
    * interleavings; [[append]] is the public one-call path. */
  private[graft] def commitStaged(spark: SparkSession, table: String,
      dataDir: String, maxAttempts: Int = 20,
      idempotencyKey: String = ""): Commit = {
    require(!idempotencyKey.contains('\n') && !idempotencyKey.contains('\t'),
      "idempotency key must not contain tab/newline")
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val latest = latestVersion(spark, table)
      val base = latest
        .flatMap(readManifestLines(spark, table, _)).getOrElse(Seq.empty)
      if (idempotencyKey.nonEmpty && base.exists(_._2 == idempotencyKey))
        return Commit(latest.get, base.find(_._2 == idempotencyKey).get._1)
      val next = nextVersionFor(spark, table, latest)
      val content = (base.map((renderLine _).tupled) :+
        renderLine(dataDir, idempotencyKey))
        .mkString("", "\n", s"\n$Footer\n")
      if (publish(spark, table, next, content))
        return Commit(next, dataDir)
      // lost the race (or a live holder has the version): wait briefly —
      // either their manifest appears (base advances) or the lease breaks
      Thread.sleep(20L)
    }
    throw new IllegalStateException(
      s"could not commit to $table after $maxAttempts attempts")
  }

  /** Append `df` as one atomic commit; returns the committed version.
    * `idempotencyKey` (optional) makes re-delivery of the same logical
    * batch a no-op — see [[commitStaged]]. */
  def append(df: DataFrame, table: String,
      idempotencyKey: String = ""): Commit = {
    val spark = df.sparkSession
    if (idempotencyKey.nonEmpty &&
      latestVersion(spark, table)
        .flatMap(readManifestLines(spark, table, _))
        .exists(_.exists(_._2 == idempotencyKey))) {
      // already committed: do not even stage (saves the orphan write)
      return commitStaged(spark, table, "", idempotencyKey = idempotencyKey)
    }
    val rel = stageData(df, table)
    commitStaged(spark, table, rel, idempotencyKey = idempotencyKey)
  }

  private def readDirs(spark: SparkSession, table: String,
      dirs: Seq[String]): DataFrame = {
    require(dirs.nonEmpty, s"snapshot of $table holds no data dirs")
    spark.read.parquet(dirs.map(d => s"$table/$d"): _*)
  }

  /** The table AS OF `version` (time travel — a committed snapshot is
    * immutable, so this stays valid after any number of later commits). */
  def readVersion(spark: SparkSession, table: String, version: Long): DataFrame =
    readDirs(spark, table,
      readManifest(spark, table, version).getOrElse(
        throw new IllegalArgumentException(
          s"$table has no committed version $version")))

  /** The latest committed snapshot. */
  def read(spark: SparkSession, table: String): DataFrame =
    readVersion(spark, table, latestVersion(spark, table).getOrElse(
      throw new IllegalArgumentException(s"$table has no committed version")))

  /** Rows ADDED between two committed versions: the manifest diff names
    * the exact data dirs, so the cost is O(added bytes) — no scan of the
    * base snapshot, no anti-join. Not defined across a [[compact]]
    * boundary (the compacted manifest REPLACES dirs rather than extending
    * them) — that case raises rather than mis-reporting. */
  def diff(spark: SparkSession, table: String, fromVersion: Long,
      toVersion: Long): DataFrame = {
    val from = readManifest(spark, table, fromVersion).getOrElse(
      throw new IllegalArgumentException(s"no committed version $fromVersion"))
    val to = readManifest(spark, table, toVersion).getOrElse(
      throw new IllegalArgumentException(s"no committed version $toVersion"))
    require(from.forall(to.contains),
      s"version $toVersion does not extend $fromVersion " +
        "(append-only versions only — a compact() rewrote the dir list)")
    readDirs(spark, table, to.filterNot(from.contains))
  }

  /** Commit a manifest whose dirs REPLACE `replaced` with `newDirs`,
    * FOLDING IN any dirs a concurrent appender committed meanwhile (they
    * are neither in `replaced` nor `newDirs`, so they ride along) — the
    * maintenance twin of [[commitStaged]]. */
  private[graft] def commitReplacing(spark: SparkSession, table: String,
      newDirs: Seq[String], replaced: Set[String],
      maxAttempts: Int = 20): Commit = {
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val latest = latestVersion(spark, table)
      val base = latest
        .flatMap(readManifestLines(spark, table, _)).getOrElse(Seq.empty)
      // concurrent appends survive, WITH their idempotency keys — and so
      // do the keys of the replaced commits (compaction must not re-open
      // the door to a re-delivered load whose data it just rewrote)
      val kept = base.filterNot(l => replaced(l._1))
      val replacedKeys = base.filter(l => replaced(l._1)).map(_._2)
        .filter(_.nonEmpty)
      val newLines = newDirs.map(renderLine(_, "")) ++
        replacedKeys.map(k => renderLine(newDirs.head, k))
      val next = nextVersionFor(spark, table, latest)
      val content = (newLines ++ kept.map((renderLine _).tupled))
        .mkString("", "\n", s"\n$Footer\n")
      if (publish(spark, table, next, content))
        return Commit(next, newDirs.mkString(","))
      Thread.sleep(20L) // wait out a live claim holder (see commitStaged)
    }
    throw new IllegalStateException(
      s"could not commit to $table after $maxAttempts attempts")
  }

  /** Small-file maintenance: rewrite the CURRENT snapshot's data dirs
    * into one compacted dir and commit a manifest that replaces them —
    * readers of every ALREADY-COMMITTED version keep their exact dirs
    * (nothing is deleted here; [[expire]] reclaims), readers of the new
    * version get the rewritten layout, and appends that land while the
    * rewrite runs are folded into the commit rather than lost. Returns
    * the new version. */
  def compact(spark: SparkSession, table: String,
      numFiles: Int = 1): Commit = {
    val v = latestVersion(spark, table).getOrElse(
      throw new IllegalArgumentException(s"$table has no committed version"))
    val dirs = readManifest(spark, table, v).get
    val rel = s"data/${java.util.UUID.randomUUID}"
    readDirs(spark, table, dirs).repartition(numFiles)
      .write.mode(SaveMode.ErrorIfExists).parquet(s"$table/$rel")
    commitReplacing(spark, table, Seq(rel), dirs.toSet)
  }

  // ------------------------------------------------- zone-map skipping

  /** Stage a batch WITH a zone-map sidecar: one tiny `.stats` file per
    * data dir carrying min/max for `statsCols` (numeric/date/string
    * ordering, nulls ignored). The sidecar rides the same commit as the
    * data — a dir and its stats are visible together or not at all. */
  private[graft] def stageDataWithStats(df: DataFrame, table: String,
      statsCols: Seq[String]): String = {
    import org.apache.spark.sql.functions.{col, min, max}
    val rel = stageData(df, table)
    // min/max under STRING ordering — the SAME ordering the readWhere
    // residual filter uses, so the prune window is sound for every
    // column (a numeric-ordered min/max rendered to string would prune
    // dirs that still contain lexically-in-range rows: min=9,max=100
    // lexically excludes "20")
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c).cast("string")).as(s"min_$c"),
        max(col(c).cast("string")).as(s"max_$c")))
    // one tiny driver-side row: per-column min/max of the staged batch
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val f = fs(df.sparkSession, table)
    val out = f.create(
      new org.apache.hadoop.fs.Path(s"$table/$rel/.stats"), false)
    try {
      val lines = statsCols.zipWithIndex.map { case (c, i) =>
        val lo = Option(r.get(2 * i)).map(_.toString).getOrElse("")
        val hi = Option(r.get(2 * i + 1)).map(_.toString).getOrElse("")
        s"$c\t$lo\t$hi"
      }.mkString("", "\n", "\n")
      out.write(lines.getBytes("UTF-8"))
    } finally out.close()
    rel
  }

  /** [[append]] with a zone-map sidecar for later [[readWhere]] pruning. */
  def appendWithStats(df: DataFrame, table: String, statsCols: Seq[String],
      idempotencyKey: String = ""): Commit = {
    val rel = stageDataWithStats(df, table, statsCols)
    commitStaged(df.sparkSession, table, rel, idempotencyKey = idempotencyKey)
  }

  private def dirStats(spark: SparkSession, table: String,
      dir: String): Map[String, (String, String)] = {
    val p = new org.apache.hadoop.fs.Path(s"$table/$dir/.stats")
    val f = fs(spark, table)
    if (!f.exists(p)) Map.empty
    else {
      val in = f.open(p)
      val lines = try {
        val src = scala.io.Source.fromInputStream(in, "UTF-8")
        try src.getLines().toVector finally src.close()
      } finally in.close()
      lines.flatMap(_.split("\t", -1) match {
        case Array(c, lo, hi) if lo.nonEmpty && hi.nonEmpty => Some(c -> (lo, hi))
        case _ => None
      }).toMap
    }
  }

  /** The latest snapshot restricted to rows where `column` falls in
    * [`lo`, `hi`] (string-comparable bounds: the stats are stored as the
    * column's string rendering — exact for strings and for fixed-width
    * digit encodings like ISO dates; numeric columns compare via the
    * cast in the residual filter, the zone map just prunes).
    *
    * DIRECTORY-level data skipping, the lakehouse zone-map: commit dirs
    * whose sidecar says `max < lo || min > hi` are dropped from the scan
    * BEFORE any parquet footer is opened — at 100 TB, a time-ordered
    * append stream makes most commits prunable for a time-ranged query,
    * and the decision costs one tiny sidecar read per commit, not a
    * footer per FILE. Dirs without a sidecar (plain [[append]]) are
    * conservatively kept. The residual filter still applies (zone maps
    * prune, never decide), so results are EXACTLY the full-scan
    * filter's. Returns (pruned frame, dirs scanned, dirs total) so
    * callers/specs can see the skipping happen.
    */
  def readWhere(spark: SparkSession, table: String, column: String,
      lo: String, hi: String): (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.col
    val dirs = readManifest(spark, table,
      latestVersion(spark, table).getOrElse(throw new IllegalArgumentException(
        s"$table has no committed version"))).get
    val kept = dirs.filter { d =>
      dirStats(spark, table, d).get(column) match {
        case Some((mn, mx)) => !(mx < lo || mn > hi) // prunable window
        case None => true // no sidecar: must scan
      }
    }
    val df = readDirs(spark, table, kept)
      .where(col(column).cast("string").between(lo, hi))
    (df, kept.size, dirs.size)
  }

  /** Retention maintenance: drop every committed manifest with version
    * < `keepFrom`, then delete data dirs that only those manifests
    * referenced (a dir still named by ANY surviving manifest — complete
    * or in-progress claim — is untouched). Orphaned staged dirs that no
    * manifest ever referenced are deliberately NOT touched: a writer may
    * be about to commit them — reclaim those with an age-based sweep,
    * not here. */
  def expire(spark: SparkSession, table: String, keepFrom: Long): Unit = {
    val f = fs(spark, table)
    val committed = committedVersions(spark, table)
    require(committed.exists(_ >= keepFrom),
      s"expire(keepFrom=$keepFrom) would drop every snapshot of $table")
    val drop = committed.filter(_ < keepFrom)
    val dropped = drop.flatMap(readManifest(spark, table, _)).flatten.toSet
    // referenced-by-survivors: complete manifests >= keepFrom AND any
    // footerless claim's partial dir list (conservative: a dead writer's
    // claim lines still pin dirs until the claim file itself is removed)
    val surviving = claimedVersions(spark, table).filter(_ >= keepFrom)
      .flatMap { v =>
        val p = new org.apache.hadoop.fs.Path(s"$table/manifests/v$v.manifest")
        val in = f.open(p)
        try {
          val src = scala.io.Source.fromInputStream(in, "UTF-8")
          try src.getLines().filterNot(_ == Footer)
            .map(parseLine(_)._1).toVector
          finally src.close()
        } finally in.close()
      }.toSet
    drop.foreach(v => f.delete(
      new org.apache.hadoop.fs.Path(s"$table/manifests/v$v.manifest"), false))
    (dropped -- surviving).foreach(d =>
      f.delete(new org.apache.hadoop.fs.Path(s"$table/$d"), true))
  }
}
