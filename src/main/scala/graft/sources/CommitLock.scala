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
              "(a healthy writer holds it, or raise CommitLock.leaseMs " +
              "breakage is disabled)")
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
    * A live-but-paused holder resuming past its lease is the classic
    * fencing gap — deployments needing that guarantee should lower
    * job-side work or use an external lock service.
    */
  private def breakIfStale(fs: org.apache.hadoop.fs.FileSystem,
                           lock: org.apache.hadoop.fs.Path): Unit =
    try {
      val st = fs.getFileStatus(lock)
      if (System.currentTimeMillis() - st.getModificationTime > leaseMs)
        fs.delete(lock, false)
    } catch { case _: java.io.IOException => () } // raced away — fine

  private def release(spark: SparkSession, path: String,
                      token: String): Unit = {
    val fs = fsOf(spark, path)
    val lock = lockPath(path)
    // delete only OUR lock: if the lease expired and someone broke and
    // re-took it, their token is in the file and we must not unlock them
    if (readToken(fs, lock).contains(token))
      try fs.delete(lock, false)
      catch { case _: java.io.IOException => () }
  }
}
