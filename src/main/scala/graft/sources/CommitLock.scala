package graft.sources

import org.apache.spark.sql.SparkSession

/** Per-layout commit mutex — the concurrency half of the manifest
  * layer's commit protocol (the crash half is the staged-append
  * journal in [[GeoParquet]]).
  *
  * The reference is a single-process batch tool; this engine's
  * streaming sinks make a writer+compactor race realistic (a
  * continuous ingest appending while a scheduled maintenance job
  * compacts).  Every mutation of the layout's commit metadata — the
  * `_epoch` read-modify-write, staged-file renames, `_manifest`
  * stats appends/flips, tombstone sidecar appends — runs inside this
  * lock, so commits serialize with unique monotone epochs and no two
  * jobs ever share a live output directory's `_temporary` tree
  * (Hadoop's FileOutputCommitter is not concurrent-safe on one
  * directory).  The EXPENSIVE work — staging a batch's files,
  * rewriting a compaction scope — happens outside the lock against
  * invisible sibling directories; only the metadata-sized commit
  * step holds it.  Compactors validate optimistically under the lock
  * (epoch + tombstone state unchanged since their read) and the
  * loser retries against the new state — the Iceberg
  * snapshot-commit model, with the lock standing in for the
  * metastore's atomic pointer swap.
  *
  * Mechanics: `_commits/lock` at the layout root, taken by atomic
  * exclusive create (O_EXCL — atomic on HDFS and local FS; object
  * stores without conditional put should front this with a real
  * lock service) and verified by token read-back, so even a
  * check-then-create race has exactly one winner.  A crashed
  * holder's lock expires after [[leaseMs]] and is broken by the next
  * acquirer; holders must finish their locked section within the
  * lease (locked sections are metadata-sized by design).
  */
object CommitLock {

  /** Lease: a lock older than this is presumed crashed and broken.
    * Must exceed the longest locked section (rename loops + sidecar
    * writes; writeManifest's footer scan is the worst case).
    */
  @volatile var leaseMs: Long = 600000L

  /** Give up acquiring after this long (a healthy holder should be
    * far faster; a crashed one is broken after [[leaseMs]]). */
  @volatile var acquireTimeoutMs: Long = 900000L

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def lockPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_commits/lock")

  /** Run `body` holding the layout's commit lock. */
  def withLock[T](spark: SparkSession, path: String)(body: => T): T = {
    val token = acquire(spark, path)
    try body
    finally release(spark, path, token)
  }

  private def acquire(spark: SparkSession, path: String): String = {
    val fs = fsOf(spark, path)
    val lock = lockPath(path)
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + acquireTimeoutMs
    var held = false
    while (!held) {
      // read-back verification: if two creates raced past a
      // non-atomic exists check, exactly one token survives
      held = exclusiveCreate(fs, lock, token) &&
        readToken(fs, lock).contains(token)
      if (!held) {
        breakIfStale(fs, lock)
        if (System.currentTimeMillis() > deadline)
          throw new IllegalStateException(
            s"commit lock on $path not acquired within ${acquireTimeoutMs}ms " +
              "(a healthy writer holds it; raise CommitLock.acquireTimeoutMs, " +
              "or raise leaseMs if breakage was disabled)")
        Thread.sleep(25)
      }
    }
    token
  }

  /** Create the lock file exclusively.  Hadoop's local-FS
    * `create(f, overwrite = false)` is check-then-TRUNCATE — two
    * racing threads can truncate a held lock or strand an orphan that
    * matches nobody's token (blocking everyone for a full lease) — so
    * the `file` scheme goes through java.nio's O_EXCL instead; HDFS
    * and friends enforce exclusivity server-side.
    */
  private def exclusiveCreate(fs: org.apache.hadoop.fs.FileSystem,
                              lock: org.apache.hadoop.fs.Path,
                              token: String): Boolean =
    if (fs.getScheme == "file")
      try {
        val p = java.nio.file.Paths.get(lock.toUri.getPath)
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, token.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        // a hadoop checksum sibling for DIFFERENT content (stranded by
        // a ChecksumFileSystem copy of `_commits`, e.g. a compaction
        // swap) would make every readToken of this lock throw — which
        // reads as "held by nobody" and blocks all writers for a lease
        dropCrcSibling(p)
        true
      } catch { case _: java.io.IOException => false }
    else
      try {
        fs.mkdirs(lock.getParent)
        val out = fs.create(lock, false)
        try out.write(token.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }

  private def readToken(fs: org.apache.hadoop.fs.FileSystem,
                        lock: org.apache.hadoop.fs.Path): Option[String] =
    try {
      val in = fs.open(lock)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8"))
      finally in.close()
    } catch { case _: java.io.IOException => None }

  /** Break a lock whose holder exceeded the lease (presumed crashed).
    *
    * The break is a RENAME to a tombstone path derived from the
    * observed (mtime, token) identity — never a delete — which closes
    * the two-breakers race of a stat-then-delete: the losing breaker's
    * rename fails either because the source is gone or because the
    * deterministic tombstone destination already exists (someone
    * already broke exactly that stale identity; a later re-created
    * FRESH lock at the same path is therefore safe from the loser's
    * delayed rename).  If a breaker's rename lands but the moved
    * file's token is NOT the stale one it observed (the lock was
    * released and re-taken between its stat and its rename), it broke
    * a live lock by mistake and restores it; a failed restore throws —
    * loud beats a silent double-hold.  Tombstones are deliberately
    * LEFT IN PLACE (one tiny file per actual crash-break — they are
    * what keeps late renames failing); [[GeoParquet.vacuum]]-style
    * sweeps may remove old ones.
    *
    * A live-but-paused holder resuming past its lease is the classic
    * fencing gap — deployments needing that guarantee should lower
    * job-side work or use an external lock service.
    */
  private def breakIfStale(fs: org.apache.hadoop.fs.FileSystem,
                           lock: org.apache.hadoop.fs.Path): Unit =
    try {
      val st = fs.getFileStatus(lock)
      if (System.currentTimeMillis() - st.getModificationTime > leaseMs) {
        // None = unreadable content (corrupt) — still break, verified
        // by mtime instead of token (renames preserve mtime)
        val observed = readToken(fs, lock)
        val tomb = new org.apache.hadoop.fs.Path(lock.getParent,
          s"lock.broken-${st.getModificationTime}-" +
            observed.fold("x")(_.hashCode.toHexString))
        if (renameNoReplace(fs, lock, tomb)) {
          val sameLock = observed match {
            case Some(t) => readToken(fs, tomb).contains(t)
            case None =>
              try fs.getFileStatus(tomb).getModificationTime ==
                st.getModificationTime
              catch { case _: java.io.IOException => false }
          }
          // raced: we moved a lock that was re-taken since our stat —
          // put the live holder's lock back
          if (!sameLock)
            require(renameNoReplace(fs, tomb, lock),
              s"commit-lock break race on $lock: broke a live lock and " +
                "could not restore it — manual repair required")
        }
      }
    } catch { case _: java.io.IOException => () } // raced away — fine

  /** Rename that NEVER clobbers an existing destination (the property
    * the break protocol leans on).  Hadoop's FileSystem.rename
    * contract is no-replace for files on HDFS, but the local
    * RawLocalFileSystem delegates to java.io semantics where a rename
    * over an existing file can succeed — so the `file` scheme goes
    * through java.nio with no REPLACE_EXISTING option.
    */
  private def renameNoReplace(fs: org.apache.hadoop.fs.FileSystem,
                              src: org.apache.hadoop.fs.Path,
                              dst: org.apache.hadoop.fs.Path): Boolean =
    if (fs.getScheme == "file")
      try {
        val s = java.nio.file.Paths.get(src.toUri.getPath)
        val d = java.nio.file.Paths.get(dst.toUri.getPath)
        java.nio.file.Files.move(s, d)
        // hadoop checksum siblings don't ride a raw nio move; a crc
        // left at either path would poison the next fs.open there
        // (ChecksumFileSystem verifies content that no longer matches)
        dropCrcSibling(s)
        dropCrcSibling(d)
        true
      } catch { case _: java.io.IOException => false }
    else
      try !fs.exists(dst) && fs.rename(src, dst)
      catch { case _: java.io.IOException => false }

  private def dropCrcSibling(p: java.nio.file.Path): Unit =
    try java.nio.file.Files.deleteIfExists(
      p.resolveSibling("." + p.getFileName.toString + ".crc"))
    catch { case _: java.io.IOException => () }

  private def release(spark: SparkSession, path: String,
                      token: String): Unit = {
    val fs = fsOf(spark, path)
    val lock = lockPath(path)
    // release only OUR lock, atomically: a read-then-delete has the
    // same window as the old break (lease expires mid-release, a new
    // holder re-creates, our delayed delete unlocks THEM).  Rename the
    // lock aside to a token-derived path first — a delayed rename
    // after a break-and-retake fails on the already-occupied tombstone
    // or moves a mismatching token that we restore.
    val tomb = new org.apache.hadoop.fs.Path(lock.getParent,
      s"lock.rel-${token.hashCode.toHexString}")
    try {
      if (renameNoReplace(fs, lock, tomb)) {
        if (readToken(fs, tomb).contains(token))
          fs.delete(tomb, false)
        else // moved someone else's fresh lock (ours was lease-broken)
          require(renameNoReplace(fs, tomb, lock),
            s"commit-lock release race on $lock: displaced a live lock " +
              "and could not restore it — manual repair required")
      }
    } catch { case _: java.io.IOException => () }
  }
}
