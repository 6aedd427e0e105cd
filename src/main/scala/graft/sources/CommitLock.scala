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
  * Mechanics: `_commits/lock` at the layout root, taken by
  * BID-AND-RENAME — each contender writes its token to its own
  * unique bid file, then no-replace-renames it onto the lock path;
  * exactly one rename lands ([[acquire]]).  A crashed holder's lock
  * expires after [[leaseMs]] and is broken by the next acquirer
  * (rename-to-tombstone, never a delete); holders must finish their
  * locked section within the lease (locked sections are
  * metadata-sized by design).
  *
  * STORE PORTABILITY: the protocol runs on five primitives
  * ([[Backend]]), and the ONLY one that must be atomic is the
  * no-replace rename — the create primitive may be a blind PUT
  * (CommitContentionSpec drives a deliberately non-atomic shim
  * through writer storms and pins exactly one holder).  The default
  * [[FsBackend]] covers POSIX (java.nio) and HDFS (server-side
  * rename semantics); an object store injects a backend whose
  * renameNoReplace rides its conditional-put/CAS primitive
  * (If-None-Match copy — the S3A-committer pattern) or defers to an
  * external lock service.
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

  /** The store primitives the lock protocol runs on.  Implementations
    * swap the MECHANISM (POSIX, HDFS RPC, object-store CAS, a lock
    * service's lease API); the PROTOCOL — read-back verification,
    * lease breaking, tombstoned break/release — stays above.
    */
  trait Backend {
    /** Write a PRIVATE file at `path` holding `token`.  Contenders
      * only ever call this on paths containing their own unique
      * token, so this primitive needs NO atomicity at all — a blind
      * PUT serves (the acquisition race is decided by
      * [[renameNoReplace]], not here).
      */
    def tryCreate(fs: org.apache.hadoop.fs.FileSystem,
                  lock: org.apache.hadoop.fs.Path, token: String): Boolean

    /** The lock file's current content, None when absent/unreadable. */
    def read(fs: org.apache.hadoop.fs.FileSystem,
             lock: org.apache.hadoop.fs.Path): Option[String]

    /** Rename that NEVER clobbers an existing destination — THE
      * atomic primitive the protocol rests on: it decides acquisition
      * (unique bid file → lock path; one contender's rename lands,
      * the rest fail on dst-exists) and makes a losing breaker's
      * delayed rename fail instead of unseating a re-created fresh
      * lock.  HDFS rename refuses an existing file destination
      * server-side; POSIX gets java.nio without REPLACE_EXISTING; an
      * object store without rename implements this as a CONDITIONAL
      * copy+delete (If-None-Match PUT — the one CAS primitive a
      * deployment must bring; without any conditional operation no
      * store can host a mutex).
      */
    def renameNoReplace(fs: org.apache.hadoop.fs.FileSystem,
                        src: org.apache.hadoop.fs.Path,
                        dst: org.apache.hadoop.fs.Path): Boolean

    def delete(fs: org.apache.hadoop.fs.FileSystem,
               lock: org.apache.hadoop.fs.Path): Unit

    /** Modification time, None when absent — the lease clock. */
    def mtime(fs: org.apache.hadoop.fs.FileSystem,
              lock: org.apache.hadoop.fs.Path): Option[Long]
  }

  /** The active backend (process-wide; a deployment sets it once at
    * startup, before any writer runs).
    */
  @volatile var backend: Backend = FsBackend

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

  /** BID-AND-RENAME acquisition: each contender writes its token to
    * its OWN bid file (a unique path — zero contention, so the create
    * primitive needs no atomicity), then tries the no-replace rename
    * onto the lock path.  The rename is the decision point: exactly
    * one lands, every loser fails on dst-exists and retries.  The
    * token read-back after a winning rename is belt-and-braces (it
    * also catches stores whose rename reports success ambiguously).
    * This is what lets the Backend be implemented over stores with
    * WEAK creates — a blind last-writer-wins PUT would break a
    * create-then-verify scheme (two verified winners: A writes+reads
    * its token, B overwrites and reads its own — measured, not
    * hypothesized, by the non-atomic-shim spec), but it cannot break
    * a rename race.
    */
  private def acquire(spark: SparkSession, path: String): String = {
    val fs = fsOf(spark, path)
    val lock = lockPath(path)
    val b = backend
    val token = java.util.UUID.randomUUID().toString
    // FULL token in the bid name: a truncated prefix would let two
    // contenders share a bid path (one deletes/overwrites the other's
    // bid on retry), and on a blind-PUT backend that can land a lock
    // holding a token neither contender verifies
    val bid = new org.apache.hadoop.fs.Path(lock.getParent,
      s"lock.bid-$token")
    val deadline = System.currentTimeMillis() + acquireTimeoutMs
    var held = false
    while (!held) {
      held = b.tryCreate(fs, bid, token) &&
        b.renameNoReplace(fs, bid, lock) &&
        b.read(fs, lock).contains(token)
      if (!held) {
        b.delete(fs, bid) // our losing bid, if the rename never moved it
        breakIfStale(fs, lock, b)
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
                           lock: org.apache.hadoop.fs.Path,
                           b: Backend): Unit =
    b.mtime(fs, lock).foreach { m =>
      if (System.currentTimeMillis() - m > leaseMs) {
        // None = unreadable content (corrupt) — still break, verified
        // by mtime instead of token (renames preserve mtime)
        val observed = b.read(fs, lock)
        val tomb = new org.apache.hadoop.fs.Path(lock.getParent,
          s"lock.broken-$m-" + observed.fold("x")(_.hashCode.toHexString))
        if (b.renameNoReplace(fs, lock, tomb)) {
          val sameLock = observed match {
            case Some(t) => b.read(fs, tomb).contains(t)
            case None => b.mtime(fs, tomb).contains(m)
          }
          // raced: we moved a lock that was re-taken since our stat —
          // put the live holder's lock back
          if (!sameLock)
            require(b.renameNoReplace(fs, tomb, lock),
              s"commit-lock break race on $lock: broke a live lock and " +
                "could not restore it — manual repair required")
        }
      }
    }

  private def release(spark: SparkSession, path: String,
                      token: String): Unit = {
    val fs = fsOf(spark, path)
    val lock = lockPath(path)
    val b = backend
    // release only OUR lock, atomically: a read-then-delete has the
    // same window as the old break (lease expires mid-release, a new
    // holder re-creates, our delayed delete unlocks THEM).  Rename the
    // lock aside to a token-derived path first — a delayed rename
    // after a break-and-retake fails on the already-occupied tombstone
    // or moves a mismatching token that we restore.
    // FULL token (tokens are per-acquisition UUIDs, never reused):
    // a 32-bit hash could collide with a crashed release's leftover
    // tombstone, making this renameNoReplace fail silently and the
    // lock wait out its whole lease
    val tomb = new org.apache.hadoop.fs.Path(lock.getParent,
      s"lock.rel-$token")
    try {
      if (b.renameNoReplace(fs, lock, tomb)) {
        if (b.read(fs, tomb).contains(token))
          b.delete(fs, tomb)
        else // moved someone else's fresh lock (ours was lease-broken)
          require(b.renameNoReplace(fs, tomb, lock),
            s"commit-lock release race on $lock: displaced a live lock " +
              "and could not restore it — manual repair required")
      }
    } catch { case _: java.io.IOException => () }
  }

  /** The default backend: atomic exclusive create (java.nio O_EXCL on
    * the local scheme — Hadoop's local `create(f, overwrite=false)` is
    * check-then-TRUNCATE and can truncate a held lock; HDFS enforces
    * exclusivity server-side) and a genuinely no-replace rename (the
    * local RawLocalFileSystem delegates rename to java.io semantics
    * where clobbering can succeed, so the local scheme goes through
    * java.nio without REPLACE_EXISTING).
    */
  object FsBackend extends Backend {
    override def tryCreate(fs: org.apache.hadoop.fs.FileSystem,
                           lock: org.apache.hadoop.fs.Path,
                           token: String): Boolean =
      if (fs.getUri.getScheme == "file")
        try {
          val p = java.nio.file.Paths.get(lock.toUri.getPath)
          java.nio.file.Files.createDirectories(p.getParent)
          java.nio.file.Files.write(p, token.getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
          // a hadoop checksum sibling for DIFFERENT content (stranded by
          // a ChecksumFileSystem copy of `_commits`, e.g. a compaction
          // swap) would make every read of this lock throw — which
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

    override def read(fs: org.apache.hadoop.fs.FileSystem,
                      lock: org.apache.hadoop.fs.Path): Option[String] =
      try {
        val in = fs.open(lock)
        try Some(new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8"))
        finally in.close()
      } catch { case _: java.io.IOException => None }

    override def renameNoReplace(fs: org.apache.hadoop.fs.FileSystem,
                                 src: org.apache.hadoop.fs.Path,
                                 dst: org.apache.hadoop.fs.Path): Boolean =
      if (fs.getUri.getScheme == "file")
        try {
          val s = java.nio.file.Paths.get(src.toUri.getPath)
          val d = java.nio.file.Paths.get(dst.toUri.getPath)
          // `Files.move` without REPLACE_EXISTING is stat-then-
          // rename(2) on POSIX: two simultaneous movers can BOTH
          // succeed inside the stat window and the later CLOBBERS the
          // earlier (measured — the mutex spec leaked two verified
          // holders under full-suite load).  link(2) is atomic
          // fail-if-exists, so link + unlink IS the no-replace rename
          // (same inode: mtime, which the break protocol verifies by,
          // rides along).  Filesystems without hard links fall back
          // to the move (single-writer dev setups only).
          try {
            java.nio.file.Files.createLink(d, s)
            java.nio.file.Files.deleteIfExists(s)
          } catch {
            case _: UnsupportedOperationException =>
              java.nio.file.Files.move(s, d)
          }
          // hadoop checksum siblings don't ride a raw nio link/move; a
          // crc left at either path would poison the next fs.open there
          // (ChecksumFileSystem verifies content that no longer matches)
          dropCrcSibling(s)
          dropCrcSibling(d)
          true
        } catch { case _: java.io.IOException => false }
      else
        try !fs.exists(dst) && fs.rename(src, dst)
        catch { case _: java.io.IOException => false }

    override def delete(fs: org.apache.hadoop.fs.FileSystem,
                        lock: org.apache.hadoop.fs.Path): Unit =
      try fs.delete(lock, false)
      catch { case _: java.io.IOException => () }

    override def mtime(fs: org.apache.hadoop.fs.FileSystem,
                       lock: org.apache.hadoop.fs.Path): Option[Long] =
      try Some(fs.getFileStatus(lock).getModificationTime)
      catch { case _: java.io.IOException => None }

    private def dropCrcSibling(p: java.nio.file.Path): Unit =
      try java.nio.file.Files.deleteIfExists(
        p.resolveSibling("." + p.getFileName.toString + ".crc"))
      catch { case _: java.io.IOException => () }
  }
}
