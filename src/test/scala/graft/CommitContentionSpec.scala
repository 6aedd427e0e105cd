package graft

import org.apache.spark.sql.functions._
import graft.sources.{CommitLock, GeoParquet}

/** Two healthy writers racing on one layout: the commit protocol must
  * serialize their metadata commits (unique epochs, no shared
  * `_temporary` trees, no fresh-over-a-hole manifests) and the
  * optimistic compactors must detect a beaten snapshot and retry —
  * never dropping a committed batch or tombstone with the retired
  * directory.  This is the cross-process writer+compactor race the
  * streaming sinks make realistic (ingest + scheduled maintenance).
  */
class CommitContentionSpec extends SparkSpec {
  import spark.implicits._

  private def inThread[T](body: => T): (Thread, java.util.concurrent.atomic.AtomicReference[Throwable]) = {
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val t = new Thread(() =>
      try body catch { case e: Throwable => err.set(e) })
    t.start()
    (t, err)
  }

  private def rethrow(e: java.util.concurrent.atomic.AtomicReference[Throwable]): Unit = {
    val t = e.get(); if (t != null) throw t
  }

  private def batch(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map(i => (i.toLong, (i % 40) * 25.0, (i % 30) * 25.0, i * 1.0))
      .toDF("id", "x", "y", "z")

  test("the commit lock is a mutex: locked sections never overlap, and a stale lock is broken") {
    val dir = java.nio.file.Files.createTempDirectory("lockmx").toString
    val active = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxActive = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 4).map { _ =>
      inThread {
        (1 to 5).foreach { _ =>
          CommitLock.withLock(spark, dir) {
            val a = active.incrementAndGet()
            maxActive.updateAndGet(m => math.max(m, a))
            Thread.sleep(15)
            active.decrementAndGet()
          }
        }
      }
    }
    threads.foreach(_._1.join(60000))
    threads.foreach(t => rethrow(t._2))
    assert(maxActive.get() == 1, s"lock overlap: ${maxActive.get()} holders")
    // a crashed holder's lock (mtime past the lease) is broken by the
    // next acquirer instead of deadlocking the layout
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(s"$dir/_commits/lock")
    val out = fs.create(lock, true)
    out.write("dead-writer".getBytes("UTF-8")); out.close()
    fs.setTimes(lock, System.currentTimeMillis() - CommitLock.leaseMs - 60000, -1)
    var ran = false
    CommitLock.withLock(spark, dir) { ran = true }
    assert(ran, "stale lock was not broken")
    // the break RENAMED the stale lock to a deterministic tombstone
    // (never a delete): the tombstone occupying its (mtime, token)-
    // derived path is what makes a second breaker's delayed rename
    // fail instead of unseating the winner's re-created fresh lock
    val tombs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/_commits"))
      .map(_.getPath.getName).filter(_.startsWith("lock.broken-"))
    assert(tombs.nonEmpty, "stale lock was deleted, not tombstoned")
  }

  test("vacuum sweeps aged _commits debris, never fresh tombstones or the live lock") {
    val dir = java.nio.file.Files.createTempDirectory("lockvac").toString + "/lay"
    GeoParquet.write(batch(0 until 300), dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commits = new org.apache.hadoop.fs.Path(s"$dir/_commits")
    // a crash-break tombstone made the honest way (stale lock broken
    // by the next acquirer), plus crashed-release and orphaned-bid
    // debris planted as a crashed writer would leave them
    val lock = new org.apache.hadoop.fs.Path(commits, "lock")
    val out = fs.create(lock, true)
    out.write("dead".getBytes("UTF-8")); out.close()
    fs.setTimes(lock, System.currentTimeMillis() - CommitLock.leaseMs - 60000, -1)
    CommitLock.withLock(spark, dir) {}
    def plant(name: String): String = {
      val p = new org.apache.hadoop.fs.Path(commits, name)
      val o = fs.create(p, true); o.write("x".getBytes("UTF-8")); o.close()
      name
    }
    val rel = plant("lock.rel-" + java.util.UUID.randomUUID())
    val bid = plant("lock.bid-" + java.util.UUID.randomUUID())
    def names() = fs.listStatus(commits).map(_.getPath.getName).toSet
    assert(names().exists(_.startsWith("lock.broken-")))
    // all fresh: vacuum must leave every one (a young break tombstone
    // is load-bearing — it fences a losing breaker's delayed rename)
    GeoParquet.vacuum(spark, dir)
    assert(names().exists(_.startsWith("lock.broken-")))
    assert(names().contains(rel) && names().contains(bid))
    // aged past several leases: rel/bid debris swept — but break
    // tombstones are retained FOREVER (a breaker paused longer than
    // any age threshold can still replay its rename; the tombstone
    // is the only fence, and it is one tiny file per actual crash)
    val old = System.currentTimeMillis() - CommitLock.leaseMs * 4
    fs.listStatus(commits).foreach { st =>
      if (st.getPath.getName != "lock") fs.setTimes(st.getPath, old, -1)
    }
    GeoParquet.vacuum(spark, dir)
    assert(!names().exists(n => n == rel || n == bid),
      s"rel/bid debris survived: ${names()}")
    assert(names().exists(_.startsWith("lock.broken-")),
      "break tombstone was swept — it must outlive any age threshold")
  }

  test("vacuum sweeps crashed row-level-op staging, never a fresh attempt") {
    val dir = java.nio.file.Files.createTempDirectory("rlovac").toString + "/lay"
    GeoParquet.write(batch(0 until 300), dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // two orphaned attempts as a crashed UPDATE would leave them:
    // `_rlo_staging/<uuid>` dirs holding staged parts (commit and
    // abort both drop the dir — presence means a driver died mid-write)
    def plant(name: String): org.apache.hadoop.fs.Path = {
      val d = new org.apache.hadoop.fs.Path(s"$dir/_rlo_staging/$name")
      fs.mkdirs(d)
      val o = fs.create(new org.apache.hadoop.fs.Path(d, "part-0.parquet"), true)
      o.write("x".getBytes("UTF-8")); o.close()
      d
    }
    val fresh = plant("fresh123")
    val dead = plant("dead4567")
    fs.setTimes(dead, System.currentTimeMillis() - CommitLock.leaseMs * 4, -1)
    GeoParquet.vacuum(spark, dir)
    assert(fs.exists(fresh),
      "a fresh (possibly live) mutation's staging was swept")
    assert(!fs.exists(dead), "crashed row-level staging leaked past vacuum")
    // reads are unaffected throughout (the sidecar is underscore-invisible)
    assert(spark.read.parquet(dir).count() == 300)
  }

  test("manifest coalesce crash between the swap renames heals forward (vacuum/compactManifest entry)") {
    val dir = java.nio.file.Files.createTempDirectory("mcoheal").toString + "/lay"
    GeoParquet.write(batch(0 until 300), dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    GeoParquet.appendWithManifest(batch(300 until 400), dir, 250.0)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = new org.apache.hadoop.fs.Path(s"$dir/_manifest")
    val rows = spark.read.parquet(m.toString)
      .orderBy("epoch", "file").collect().toSeq
    // plant the exact crash state: stage fully written (a verified
    // coalesced copy), original moved to the preserve, second rename
    // never ran — `_manifest` is missing
    val stage = new org.apache.hadoop.fs.Path(s"$dir/_manifest.coalesced")
    spark.read.parquet(m.toString).orderBy("epoch", "file").coalesce(1)
      .write.parquet(stage.toString)
    val pre = new org.apache.hadoop.fs.Path(s"$dir/_manifest.pre-coalesce")
    assert(fs.rename(m, pre))
    assert(!fs.exists(m))
    // any maintenance entry heals: vacuum rolls the swap FORWARD
    GeoParquet.vacuum(spark, dir)
    assert(fs.exists(m) && !fs.exists(pre) && !fs.exists(stage),
      "crashed coalesce swap was not rolled forward")
    assert(spark.read.parquet(m.toString)
      .orderBy("epoch", "file").collect().toSeq == rows,
      "healed manifest diverged from the original rows")
    // the other stranded state — preserve only, no stage — restores
    assert(fs.rename(m, pre))
    GeoParquet.compactManifest(spark, dir)
    assert(fs.exists(m) && !fs.exists(pre),
      "preserve-only crash state was not restored")
    assert(spark.read.parquet(m.toString)
      .orderBy("epoch", "file").collect().toSeq == rows)
  }

  test("a deliberately NON-atomic backend still yields exactly one winner (bid-and-rename protocol)") {
    // the pluggable-backend contract: the protocol above the Backend
    // trait must not depend on the create primitive being atomic —
    // this shim's create is a blind truncating PUT with a widened
    // race window (two racing creates BOTH 'succeed', last writer
    // wins), the weakest write an object store offers.  The
    // acquisition race is decided by the no-replace RENAME of each
    // contender's unique bid file, the one primitive that must be
    // conditional — a create-then-verify scheme measurably leaks two
    // verified winners under this shim (that failure drove the
    // bid-and-rename design; re-verified here as exactly one holder).
    val shim = new CommitLock.Backend {
      override def tryCreate(fs: org.apache.hadoop.fs.FileSystem,
                             lock: org.apache.hadoop.fs.Path,
                             token: String): Boolean = {
        val p = java.nio.file.Paths.get(lock.toUri.getPath)
        java.nio.file.Files.createDirectories(p.getParent)
        Thread.`yield`() // widen any check-to-write window on purpose
        try {
          java.nio.file.Files.write(p, token.getBytes("UTF-8")) // blind PUT
          true
        } catch { case _: java.io.IOException => false }
      }
      override def read(fs: org.apache.hadoop.fs.FileSystem,
                        lock: org.apache.hadoop.fs.Path): Option[String] =
        CommitLock.FsBackend.read(fs, lock)
      override def renameNoReplace(fs: org.apache.hadoop.fs.FileSystem,
                                   src: org.apache.hadoop.fs.Path,
                                   dst: org.apache.hadoop.fs.Path): Boolean =
        CommitLock.FsBackend.renameNoReplace(fs, src, dst)
      override def delete(fs: org.apache.hadoop.fs.FileSystem,
                          lock: org.apache.hadoop.fs.Path): Unit =
        CommitLock.FsBackend.delete(fs, lock)
      override def mtime(fs: org.apache.hadoop.fs.FileSystem,
                         lock: org.apache.hadoop.fs.Path): Option[Long] =
        CommitLock.FsBackend.mtime(fs, lock)
    }
    val dir = java.nio.file.Files.createTempDirectory("lockshim").toString
    val prev = CommitLock.backend
    CommitLock.backend = shim
    try {
      val active = new java.util.concurrent.atomic.AtomicInteger(0)
      val maxActive = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (1 to 6).map { _ =>
        inThread {
          (1 to 8).foreach { _ =>
            CommitLock.withLock(spark, dir) {
              val a = active.incrementAndGet()
              maxActive.updateAndGet(m => math.max(m, a))
              Thread.sleep(5)
              active.decrementAndGet()
            }
          }
        }
      }
      threads.foreach(_._1.join(120000))
      threads.foreach(t => rethrow(t._2))
      assert(maxActive.get() == 1,
        s"non-atomic backend leaked ${maxActive.get()} concurrent holders " +
          "past the read-back verification")
    } finally CommitLock.backend = prev
  }

  test("a lease-broken holder's release leaves the breaker's lock intact") {
    // the ADVICE race, other side: holder A exceeds its lease inside
    // the locked section, B breaks and acquires; A's release must not
    // unlock B (read-then-delete would, in its stat window)
    val dir = java.nio.file.Files.createTempDirectory("lockrel").toString
    val oldLease = CommitLock.leaseMs
    CommitLock.leaseMs = 300
    try {
      val aHolding = new java.util.concurrent.CountDownLatch(1)
      val bHolds = new java.util.concurrent.CountDownLatch(1)
      val aReleased = new java.util.concurrent.CountDownLatch(1)
      val (ta, ea) = inThread {
        CommitLock.withLock(spark, dir) {
          aHolding.countDown()
          // stay inside past the lease until B has broken in
          assert(bHolds.await(60, java.util.concurrent.TimeUnit.SECONDS))
        } // A's release runs here, against B's fresh lock
        aReleased.countDown()
      }
      assert(aHolding.await(60, java.util.concurrent.TimeUnit.SECONDS))
      Thread.sleep(400) // A's lease expires
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val lock = new org.apache.hadoop.fs.Path(s"$dir/_commits/lock")
      val (tb, eb) = inThread {
        CommitLock.withLock(spark, dir) { // breaks A's stale lock
          bHolds.countDown()
          assert(aReleased.await(60, java.util.concurrent.TimeUnit.SECONDS))
          // A has fully released; B still holds — the lock file must
          // still be there (A restored it after seeing B's token)
          assert(fs.exists(lock),
            "the lease-broken holder's release removed the breaker's lock")
        }
      }
      ta.join(60000); tb.join(60000)
      rethrow(ea); rethrow(eb)
      assert(!fs.exists(lock), "B's own release did not clear its lock")
    } finally CommitLock.leaseMs = oldLease
  }

  test("two interleaved appendWithManifest writers: unique epochs, nothing lost") {
    val dir = java.nio.file.Files.createTempDirectory("contbin").toString
    GeoParquet.write(batch(0 until 50), dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    val (t1, e1) = inThread {
      (0 until 4).foreach { i =>
        GeoParquet.appendWithManifest(
          batch(1000 + i * 100 until 1000 + i * 100 + 40), dir, 250.0)
      }
    }
    val (t2, e2) = inThread {
      (0 until 4).foreach { i =>
        GeoParquet.appendWithManifest(
          batch(5000 + i * 100 until 5000 + i * 100 + 40), dir, 250.0)
      }
    }
    t1.join(300000); t2.join(300000)
    rethrow(e1); rethrow(e2)
    // every batch's rows are present exactly once — no commit was lost
    // to an interleaved rename or a shared _temporary tree
    val ids = GeoParquet.read(spark, dir).select("id").as[Long].collect()
    val want = (0L until 50L) ++
      (0 until 4).flatMap(i => 1000L + i * 100 until 1040L + i * 100) ++
      (0 until 4).flatMap(i => 5000L + i * 100 until 5040L + i * 100)
    assert(ids.sorted.toSeq == want.sorted, "lost or duplicated batch rows")
    // epochs serialized: eight commits = eight bumps.  An unlocked
    // read-modify-write would lose updates under this interleaving
    // (two writers reading N and both writing N+1).
    assert(GeoParquet.readEpoch(spark, dir) == 8L,
      s"epoch ${GeoParquet.readEpoch(spark, dir)} after 8 commits — " +
        "lost update on the epoch RMW")
    // the manifest is either fresh, or stale-and-repairable — never
    // fresh over a hole: a pruned read after repair sees every row
    if (!GeoParquet.manifestFresh(spark, dir, verify = false))
      GeoParquet.writeManifest(spark, dir)
    val pruned = GeoParquet.queryBoxViaManifest(spark, dir, (-1e9, 1e9), (-1e9, 1e9))
    assert(pruned.count() == want.size)
    // no stranded staging siblings
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.list().exists(_.startsWith(
      new java.io.File(dir).getName + ".staging-")))
  }

  test("appendCurve racing compactCurveScoped: losers retry, no committed file is lost") {
    val dir = java.nio.file.Files.createTempDirectory("contcurve").toString
    GeoParquet.writeZOrdered(batch(0 until 60), dir, 50.0, nFiles = 2)
    GeoParquet.writeManifest(spark, dir)
    val (t1, e1) = inThread {
      (0 until 5).foreach { i =>
        var landed = false
        var tries = 0
        while (!landed) {
          try {
            GeoParquet.appendCurve(
              batch(2000 + i * 100 until 2000 + i * 100 + 30), dir, 50.0)
            landed = true
          } catch {
            // the loser's contract: a stale-manifest refusal during a
            // concurrent compactor's swap→rebuild window is transient
            case _: IllegalArgumentException if tries < 50 =>
              tries += 1; Thread.sleep(100)
          }
        }
      }
    }
    val (t2, e2) = inThread {
      (0 until 3).foreach { _ =>
        try GeoParquet.compactCurveScoped(spark, dir, filesPerRun = 4,
          maxOverlap = 1)
        catch { // stale manifest mid-append commit: repair and go on
          case _: IllegalArgumentException =>
            GeoParquet.writeManifest(spark, dir)
        }
        Thread.sleep(50)
      }
    }
    t1.join(300000); t2.join(300000)
    rethrow(e1); rethrow(e2)
    val want = ((0L until 60L) ++
      (0 until 5).flatMap(i => 2000L + i * 100 until 2030L + i * 100)).sorted
    // raw read first: every committed file survived the compactions
    val raw = spark.read.option("recursiveFileLookup", "true").parquet(dir)
      .select("id").as[Long].collect().sorted.toSeq
    assert(raw == want, "a compaction swap dropped a committed batch")
    // and the pruned curve read agrees after at most one repair
    if (!GeoParquet.manifestFresh(spark, dir, verify = false))
      GeoParquet.writeManifest(spark, dir)
    val pruned = GeoParquet.queryBoxCurve(spark, dir, (-1e9, 1e9), (-1e9, 1e9), 50.0)
      .select("id").as[Long].collect().sorted.toSeq
    assert(pruned == want)
  }

  test("deleteWhere racing compact: the tombstone is never resurrected by the swap") {
    val dir = java.nio.file.Files.createTempDirectory("contdel").toString
    GeoParquet.write(batch(0 until 400), dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    val (t1, e1) = inThread {
      (0 until 3).foreach(_ => GeoParquet.compact(spark, dir))
    }
    val (t2, e2) = inThread {
      (0 until 4).foreach { i =>
        GeoParquet.deleteWhere(spark, dir, col("id") % 40 === i)
        Thread.sleep(30)
      }
    }
    t1.join(300000); t2.join(300000)
    rethrow(e1); rethrow(e2)
    // every delete holds: either still pending (subtracted at read) or
    // applied physically by a compaction that SAW it — a compactor
    // that read before the delete landed must have lost its race
    val got = GeoParquet.readMerged(spark, dir).select("id").as[Long].collect()
    val want = (0L until 400L).filterNot(id => (0 until 4).contains((id % 40).toInt))
    assert(got.sorted.toSeq == want.sorted, "a tombstone vanished with the swap")
  }

  test("two concurrent positional upserts on disjoint keys: one copy per key, both updates live") {
    val dir = java.nio.file.Files.createTempDirectory("contup").toString
    GeoParquet.write(batch(0 until 200), dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    val (t1, e1) = inThread {
      GeoParquet.upsertPositional(
        batch(0 until 50).withColumn("z", $"z" + 10000.0), dir, "id", 250.0)
    }
    val (t2, e2) = inThread {
      GeoParquet.upsertPositional(
        batch(100 until 150).withColumn("z", $"z" + 20000.0), dir, "id", 250.0)
    }
    t1.join(300000); t2.join(300000)
    rethrow(e1); rethrow(e2)
    val r = GeoParquet.readMerged(spark, dir).select("id", "z")
      .as[(Long, Double)].collect()
    assert(r.length == 200, s"${r.length} rows — duplicate or lost keys")
    assert(r.map(_._1).distinct.length == 200)
    r.foreach { case (id, z) =>
      val expect =
        if (id < 50) id + 10000.0
        else if (id >= 100 && id < 150) id + 20000.0
        else id * 1.0
      assert(z == expect, s"id=$id z=$z expected $expect")
    }
  }
}
