package graft

import org.apache.spark.sql.functions._
import graft.sources.GeoParquet

/** Incremental maintenance of curve-clustered layouts: appendCurve
  * (O(batch) manifest extension), compactCurve (global re-sort), and
  * the manifest-answered box count.
  */
class CurveAppendSpec extends SparkSpec {
  import spark.implicits._

  private def boxIds(df: org.apache.spark.sql.DataFrame,
                     xr: (Double, Double), yr: (Double, Double)): Set[Long] =
    df.filter($"x" >= xr._1 && $"x" < xr._2 && $"y" >= yr._1 && $"y" < yr._2)
      .select("id").as[Long].collect().toSet

  test("appendCurve: manifest stays fresh, pruned curve reads see the appended rows") {
    val dir = java.nio.file.Files.createTempDirectory("capp").toString
    val pts = graft.core.Tables.eventsPoints(spark, sf)
    GeoParquet.writeZOrdered(pts.filter($"id" % 2 === 0), dir, 50.0, 8)
    GeoParquet.writeManifest(spark, dir)
    GeoParquet.appendCurve(pts.filter($"id" % 2 === 1), dir, 50.0, nFiles = 2)

    // the epoch handshake held — no stale fallback on the next read
    assert(GeoParquet.readEpoch(spark, dir) == 1L)
    val xr = (0.0, 200.0); val yr = (0.0, 200.0)
    val got = GeoParquet.queryBoxCurve(spark, dir, xr, yr, 50.0)
    assert(got.select("id").as[Long].collect().toSet == boxIds(pts, xr, yr),
      "pruned curve read after appendCurve lost or invented rows")
    // both halves are visible THROUGH the pruned path: parity check
    val parities = got.select(($"id" % 2).as("p")).distinct().as[Long].collect().toSet
    assert(parities == Set(0L, 1L))
    // file pruning still prunes: the small box opens a strict subset
    val total = spark.read.parquet(dir).inputFiles.length
    assert(got.inputFiles.length < total,
      s"${got.inputFiles.length} of $total files opened for a 1% box")
    // manifest rows grew by the appended file count, all with k ranges
    val m = spark.read.parquet(s"$dir/_manifest")
    assert(m.count() == total)
    assert(m.filter($"k0".isNull || $"k1".isNull).count() == 0)
  }

  test("appendCurve serves both curves and rejects unmanifested/non-curve layouts") {
    val pts = graft.core.Tables.eventsPoints(spark, sf)
    // hilbert path
    val dirH = java.nio.file.Files.createTempDirectory("capph").toString
    GeoParquet.writeHilbertClustered(pts.filter($"id" % 2 === 0), dirH, 50.0, 8)
    GeoParquet.writeManifest(spark, dirH)
    GeoParquet.appendCurve(pts.filter($"id" % 2 === 1), dirH, 50.0, nFiles = 2)
    val xr = (0.0, 200.0); val yr = (0.0, 200.0)
    assert(GeoParquet.queryBoxCurve(spark, dirH, xr, yr, 50.0)
      .select("id").as[Long].collect().toSet == boxIds(pts, xr, yr))
    // no manifest -> explicit refusal (pruning would silently degrade)
    val dirN = java.nio.file.Files.createTempDirectory("cappn").toString
    GeoParquet.writeZOrdered(pts, dirN, 50.0, 4)
    intercept[IllegalArgumentException] {
      GeoParquet.appendCurve(pts.limit(1), dirN, 50.0)
    }
    // bin-partitioned layout -> wrong entry point
    val dirB = java.nio.file.Files.createTempDirectory("cappb").toString
    GeoParquet.write(pts, dirB, 50.0)
    GeoParquet.writeManifest(spark, dirB)
    intercept[IllegalArgumentException] {
      GeoParquet.appendCurve(pts.limit(1), dirB, 50.0)
    }
  }

  test("compactCurve: restores a disjoint globally-sorted chain; reads stay correct") {
    val dir = java.nio.file.Files.createTempDirectory("ccomp").toString
    val pts = graft.core.Tables.eventsPoints(spark, sf)
    GeoParquet.writeZOrdered(pts.filter($"id" % 3 === 0), dir, 50.0, 4)
    GeoParquet.writeManifest(spark, dir)
    GeoParquet.appendCurve(pts.filter($"id" % 3 === 1), dir, 50.0, nFiles = 2)
    GeoParquet.appendCurve(pts.filter($"id" % 3 === 2), dir, 50.0, nFiles = 2)
    GeoParquet.compactCurve(spark, dir, nFiles = 4)

    assert(spark.read.parquet(dir).inputFiles.length == 4)
    // per-file key ranges are pairwise disjoint again (global sort)
    val ranges = spark.read.parquet(s"$dir/_manifest")
      .select("k0", "k1").as[(Long, Long)].collect().sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, s"overlap: $hi >= $lo")
      case _ =>
    }
    // fresh manifest (compact bumped + re-manifested), pruned read exact
    val xr = (0.0, 200.0); val yr = (0.0, 200.0)
    val got = GeoParquet.queryBoxCurve(spark, dir, xr, yr, 50.0)
    assert(got.select("id").as[Long].collect().toSet == boxIds(pts, xr, yr))
    assert(got.inputFiles.length < 4)
  }

  test("streaming curve ingest: seeds, appends, keeps BIGMIN reads pruned, gated compaction") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("curve_ingest").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double, Double, Double)]
    val pts = mem.toDF().toDF("id", "x", "y", "z")
    val q = graft.streaming.EventStream.ingestCurveParquet(
      pts, s"$dir/data", 50.0, s"$dir/ckpt",
      nFilesPerBatch = 1, compactTo = 2, maxOverlap = 1)
    mem.addData((1L, 10.0, 20.0, 1.0), (2L, 510.0, -520.0, 2.0)) // seeds
    q.processAllAvailable()
    mem.addData((3L, 12.0, 22.0, 3.0)) // appendCurve — overlaps the seed range
    q.processAllAvailable()
    mem.addData((4L, 11.0, 21.0, 4.0))
    q.processAllAvailable()
    q.stop()
    // manifest stayed fresh through every append/compact: the curve
    // read takes the PRUNED path and sees all ingested rows
    assert(GeoParquet.readEpoch(spark, s"$dir/data") > 0L)
    val got = GeoParquet.queryBoxCurve(
      spark, s"$dir/data", (0.0, 100.0), (0.0, 100.0), 50.0)
    assert(got.select("id").as[Long].collect().toSet == Set(1L, 3L, 4L))
    // the per-batch gate (maxOverlap=1) already compacted: a fresh
    // gate call declines, and file key ranges are pairwise disjoint
    assert(!GeoParquet.compactCurveIfNeeded(spark, s"$dir/data", 2, maxOverlap = 1))
    val ranges = spark.read.parquet(s"$dir/data/_manifest")
      .select("k0", "k1").as[(Long, Long)].collect().sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, s"overlap: $hi >= $lo")
      case _ =>
    }
    // idempotency markers survived the compaction swaps
    assert(new java.io.File(s"$dir/data/_batches").list().nonEmpty)
  }

  test("curve streaming replay stays idempotent under interleaved positional deletes") {
    // the _batches replay guarantee already survives compaction swaps;
    // this drives the full chaos interleaving: stream → deleteWhere
    // (positional tombstones) → restart-replay → delete → compaction
    // (applies tombstones physically) → full restart-replay.  Deleted
    // rows must never resurrect and no replay may duplicate a batch.
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("curve_chaos").toString
    val data = s"$dir/data"
    val b0 = Seq((1L, 10.0, 20.0, 1.0), (2L, 510.0, -520.0, 2.0))
    val b1 = Seq((3L, 12.0, 22.0, 3.0), (4L, 600.0, -600.0, 4.0))
    val b2 = Seq((5L, 14.0, 24.0, 5.0))
    def run(ckpt: String, batches: Seq[(Long, Double, Double, Double)]*): Unit = {
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double, Double, Double)]
      val q = graft.streaming.EventStream.ingestCurveParquet(
        mem.toDF().toDF("id", "x", "y", "z"), data, 50.0, s"$dir/$ckpt",
        nFilesPerBatch = 1, compactTo = 2, maxOverlap = 1)
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      q.stop()
    }
    run("ck1", b0, b1)
    // positional delete between stream runs: no epoch bump, manifest
    // stays fresh, the subtraction rides every read
    GeoParquet.deleteWhere(spark, data, $"id" === 3)
    assert(GeoParquet.readMerged(spark, data)
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 4L))
    // restart-replay with the deleted row's batch included: markers
    // make batches 0-1 no-ops (id 3 must NOT resurrect), batch 2 lands
    run("ck2", b0, b1, b2)
    assert(GeoParquet.readMerged(spark, data)
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 4L, 5L))
    // second delete, then compaction: tombstones become physical, the
    // sidecar clears, markers survive the swap
    GeoParquet.deleteWhere(spark, data, $"id" === 1)
    GeoParquet.compactCurve(spark, data, 2)
    assert(GeoParquet.pendingPositional(spark, data).isEmpty)
    // full restart-replay against the compacted layout: pure no-op
    run("ck3", b0, b1, b2)
    val fin = GeoParquet.readMerged(spark, data).select("id").as[Long].collect()
    assert(fin.toSet == Set(2L, 4L, 5L) && fin.length == 3) // no dup copies
    // the manifest handshake held through all of it: pruned curve
    // reads serve the final state (deletes subtracted, nothing lost)
    val got = GeoParquet.queryBoxCurve(spark, data, (0.0, 700.0), (-700.0, 100.0), 50.0)
    assert(got.select("id").as[Long].collect().toSet == Set(2L, 4L, 5L))
  }

  test("time-range manifest stats: recent-window queries prune historical batches") {
    val dir = java.nio.file.Files.createTempDirectory("boxtime").toString
    val pts = graft.core.Tables.eventsPoints(spark, sf)
      .select("id", "x", "y", "z", "t")
    val (t1, t2) = (1704844800000L, 1705708800000L) // Jan 10 / Jan 20
    GeoParquet.write(pts.filter($"t" < t1), dir, 50.0)
    GeoParquet.writeManifest(spark, dir)
    GeoParquet.appendWithManifest(pts.filter($"t" >= t1 && $"t" < t2), dir, 50.0)
    GeoParquet.appendWithManifest(pts.filter($"t" >= t2), dir, 50.0)
    // manifest stayed fresh and carries time stats for every file
    val m = spark.read.parquet(s"$dir/_manifest")
    assert(m.columns.contains("t0") && m.filter($"t0".isNull).count() == 0)
    // a window inside (t1, t2): only middle-batch files are opened
    val tr = (1705000000000L, 1705600000000L)
    val got = GeoParquet.queryBoxTimeViaManifest(
      spark, dir, (-1e9, 1e9), (-1e9, 1e9), tr)
    val want = pts.filter($"t" >= tr._1 && $"t" < tr._2)
      .select("id").as[Long].collect().toSet
    assert(got.select("id").as[Long].collect().toSet == want)
    val total = spark.read.parquet(dir).inputFiles.length
    val middle = m.filter($"t1" >= tr._1 && $"t0" < tr._2).count()
    assert(got.inputFiles.length.toLong == middle && middle < total,
      s"${got.inputFiles.length} opened, $middle time-matching of $total files")
    // a window before all data: zero files, empty result
    assert(GeoParquet.queryBoxTimeViaManifest(
      spark, dir, (-1e9, 1e9), (-1e9, 1e9), (0L, 1000L)).count() == 0L)
  }

  test("continuity guard: a stale-start append never marks the manifest fresh over a hole") {
    val fsConf = spark.sparkContext.hadoopConfiguration
    val pts = graft.core.Tables.eventsPoints(spark, sf).select("id", "x", "y", "z")
    // bin path: an out-of-band append() bumps the epoch without stats
    // (exactly the state a crash between renames and stats-append
    // leaves); the next appendWithManifest must DEGRADE to a plain
    // append, not extend the manifest and stamp the hole fresh
    val dir = java.nio.file.Files.createTempDirectory("cont").toString
    GeoParquet.write(pts.filter($"id" % 3 === 0), dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    GeoParquet.append(pts.filter($"id" % 3 === 1), dir, 250.0) // hole
    val rowsBefore = spark.read.parquet(s"$dir/_manifest").count()
    GeoParquet.appendWithManifest(pts.filter($"id" % 3 === 2), dir, 250.0)
    assert(spark.read.parquet(s"$dir/_manifest").count() == rowsBefore,
      "stale-start appendWithManifest extended the manifest over a hole")
    // reads fall back (stale) and see EVERYTHING — nothing lost
    val got = GeoParquet.queryBoxViaManifest(spark, dir, (-1e9, 1e9), (-1e9, 1e9))
    assert(got.count() == pts.count())
    // writeManifest repairs; incremental maintenance resumes
    GeoParquet.writeManifest(spark, dir)
    GeoParquet.appendWithManifest(pts.limit(3)
      .withColumn("id", $"id" + 9000000L), dir, 250.0)
    assert(spark.read.parquet(s"$dir/_manifest").count() > rowsBefore)
    assert(GeoParquet.queryBoxViaManifest(spark, dir, (-1e9, 1e9), (-1e9, 1e9))
      .count() == pts.count() + 3)

    // curve path: a torn commit (epoch bumped, `_manifest_epoch` gone)
    // must make appendCurve refuse loudly — there is no sound
    // bin-append to degrade to
    val dirC = java.nio.file.Files.createTempDirectory("contc").toString
    GeoParquet.writeZOrdered(pts.filter($"id" % 2 === 0), dirC, 50.0, 4)
    GeoParquet.writeManifest(spark, dirC)
    GeoParquet.appendCurve(pts.filter($"id" % 2 === 1), dirC, 50.0) // epoch -> 1
    val fs = new org.apache.hadoop.fs.Path(dirC).getFileSystem(fsConf)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dirC/_manifest_epoch"), false)
    intercept[IllegalArgumentException] {
      GeoParquet.appendCurve(pts.limit(1), dirC, 50.0)
    }
  }

  test("empty batches are no-ops: manifest stays fresh, nothing staged") {
    val pts = graft.core.Tables.eventsPoints(spark, sf).select("id", "x", "y", "z")
    val dir = java.nio.file.Files.createTempDirectory("emptyb").toString
    GeoParquet.writeZOrdered(pts, dir, 50.0, 4)
    GeoParquet.writeManifest(spark, dir)
    val before = spark.read.parquet(s"$dir/_manifest").count()
    GeoParquet.appendCurve(pts.filter($"id" < 0), dir, 50.0) // empty
    assert(spark.read.parquet(s"$dir/_manifest").count() == before)
    // still fresh: pruned read, exact
    assert(GeoParquet.queryBoxCurve(spark, dir, (0.0, 200.0), (0.0, 200.0), 50.0)
      .count() == boxIds(pts, (0.0, 200.0), (0.0, 200.0)).size.toLong)

    val dirB = java.nio.file.Files.createTempDirectory("emptybb").toString
    GeoParquet.write(pts, dirB, 250.0)
    GeoParquet.writeManifest(spark, dirB)
    val beforeB = spark.read.parquet(s"$dirB/_manifest").count()
    GeoParquet.appendWithManifest(pts.filter($"id" < 0), dirB, 250.0) // empty
    assert(spark.read.parquet(s"$dirB/_manifest").count() == beforeB)
    assert(GeoParquet.queryBoxViaManifest(spark, dirB, (0.0, 200.0), (0.0, 200.0))
      .count() == boxIds(pts, (0.0, 200.0), (0.0, 200.0)).size.toLong)
  }

  test("minMaxBoxViaManifest: interior stats come from the manifest alone") {
    val dir = java.nio.file.Files.createTempDirectory("mmbox").toString
    val pts = graft.core.Tables.eventsPoints(spark, sf)
    GeoParquet.writeZOrdered(pts, dir, 50.0, 16)
    GeoParquet.writeManifest(spark, dir)
    // whole domain: every file interior — zero data files opened
    val all = GeoParquet.minMaxBoxViaManifest(spark, dir, (-1e9, 1e9), (-1e9, 1e9))
    assert(all.inputFiles.forall(_.contains("_manifest")),
      s"data files opened for an interior-only min/max: ${all.inputFiles.toSeq}")
    val want = pts.agg(count("*"), min("z"), max("z"))
      .as[(Long, Double, Double)].head()
    assert(all.as[(Long, Double, Double)].head() == want)
    // boundary-straddling box: exact, pruned
    val xr = (0.0, 200.0); val yr = (0.0, 200.0)
    val mixed = GeoParquet.minMaxBoxViaManifest(spark, dir, xr, yr)
    val wantBox = pts.filter($"x" >= 0 && $"x" < 200 && $"y" >= 0 && $"y" < 200)
      .agg(count("*"), min("z"), max("z")).as[(Long, Double, Double)].head()
    assert(mixed.as[(Long, Double, Double)].head() == wantBox)
    val total = spark.read.parquet(dir).inputFiles.length
    val opened = mixed.inputFiles.count(!_.contains("_manifest"))
    assert(opened < total, s"$opened of $total data files opened")
    // stale layout -> correct unpruned fallback
    GeoParquet.append(pts.limit(3)
      .withColumn("id", $"id" + 9000000L)
      .withColumn("x", lit(10.0)).withColumn("y", lit(10.0)), dir, 50.0)
    val stale = GeoParquet.minMaxBoxViaManifest(spark, dir, xr, yr)
    assert(stale.as[(Long, Double, Double)].head()._1 == wantBox._1 + 3L)
  }

  test("queryBoxAsOf: snapshots pin epochs; lost history refuses loudly") {
    val dir = java.nio.file.Files.createTempDirectory("snap").toString
    val pts = graft.core.Tables.eventsPoints(spark, sf).select("id", "x", "y", "z")
    val box = ((-1e9, 1e9), (-1e9, 1e9))
    GeoParquet.write(pts.filter($"id" % 2 === 0), dir, 250.0)
    GeoParquet.writeManifest(spark, dir) // epoch 0
    GeoParquet.appendWithManifest(pts.filter($"id" % 2 === 1), dir, 250.0) // epoch 1
    val evens = pts.filter($"id" % 2 === 0).select("id").as[Long].collect().toSet
    val snap0 = GeoParquet.queryBoxAsOf(spark, dir, 0L, box._1, box._2)
    assert(snap0.select("id").as[Long].collect().toSet == evens,
      "epoch-0 snapshot must be exactly the seed batch")
    val snap1 = GeoParquet.queryBoxAsOf(spark, dir, 1L, box._1, box._2)
    assert(snap1.count() == pts.count())
    // the snapshot is PLANNED away, not filtered away: only epoch-0 files open
    val e0Files = spark.read.parquet(s"$dir/_manifest")
      .filter($"epoch" === 0L).count()
    assert(snap0.inputFiles.length.toLong == e0Files)
    // pre-history epoch: refuse
    intercept[IllegalArgumentException] {
      GeoParquet.queryBoxAsOf(spark, dir, -1L, box._1, box._2)
    }
    // stale manifest: no sound snapshot to serve — refuse
    GeoParquet.append(pts.limit(2).withColumn("id", $"id" + 9000000L), dir, 250.0)
    intercept[IllegalArgumentException] {
      GeoParquet.queryBoxAsOf(spark, dir, 0L, box._1, box._2)
    }
    // a manifest rebuild stamps everything with the current epoch:
    // older snapshots are gone (refused), the current one sees all rows
    GeoParquet.writeManifest(spark, dir)
    intercept[IllegalArgumentException] {
      GeoParquet.queryBoxAsOf(spark, dir, 0L, box._1, box._2)
    }
    val now = GeoParquet.readEpoch(spark, dir)
    assert(GeoParquet.queryBoxAsOf(spark, dir, now, box._1, box._2).count()
      == pts.count() + 2L)
  }

  test("snapshots inventory and TTL expiry ride the same sidecars") {
    val dir = java.nio.file.Files.createTempDirectory("snapinv").toString
    val pts = graft.core.Tables.eventsPoints(spark, sf)
      .select("id", "x", "y", "z", "t")
    GeoParquet.write(pts.filter($"id" % 3 === 0), dir, 250.0)
    GeoParquet.writeManifest(spark, dir) // epoch 0
    GeoParquet.appendWithManifest(pts.filter($"id" % 3 === 1), dir, 250.0) // 1
    GeoParquet.appendWithManifest(pts.filter($"id" % 3 === 2), dir, 250.0) // 2
    val inv = GeoParquet.snapshots(spark, dir).collect()
    assert(inv.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(inv.map(r => r.getAs[Long]("n_rows")).sum == pts.count())
    // TTL: expire everything before the median t, merge-on-read
    val cutoff = pts.selectExpr("percentile_approx(t, 0.5)").head().getLong(0)
    GeoParquet.expireOlderThan(spark, dir, cutoff)
    val merged = GeoParquet.readMerged(spark, dir)
    assert(merged.filter($"t" < cutoff).count() == 0)
    assert(merged.count() == pts.filter($"t" >= cutoff).count())
  }

  test("countBoxViaManifest: interior files are counted without being opened") {
    val dir = java.nio.file.Files.createTempDirectory("cbox").toString
    val pts = graft.core.Tables.eventsPoints(spark, sf)
    GeoParquet.writeZOrdered(pts, dir, 50.0, 16)
    GeoParquet.writeManifest(spark, dir)
    // a box covering the whole domain: EVERY file is interior — the
    // count must come from the manifest alone, zero data files opened
    val all = GeoParquet.countBoxViaManifest(
      spark, dir, (-1e9, 1e9), (-1e9, 1e9))
    assert(all.inputFiles.forall(_.contains("_manifest")),
      s"data files opened for an interior-only count: ${all.inputFiles.toSeq}")
    assert(all.as[Long].head() == pts.count())
    // a boundary-straddling box: exact, and only boundary files opened
    val xr = (0.0, 200.0); val yr = (0.0, 200.0)
    val mixed = GeoParquet.countBoxViaManifest(spark, dir, xr, yr)
    assert(mixed.as[Long].head() == boxIds(pts, xr, yr).size.toLong)
    val total = spark.read.parquet(dir).inputFiles.length
    val opened = mixed.inputFiles.count(!_.contains("_manifest"))
    assert(opened < total, s"$opened of $total data files opened")
    // stale layout (out-of-band append) -> correct unpruned fallback
    GeoParquet.append(pts.limit(5)
      .withColumn("id", $"id" + 9000000L)
      .withColumn("x", lit(10.0)).withColumn("y", lit(10.0)), dir, 50.0)
    val stale = GeoParquet.countBoxViaManifest(spark, dir, xr, yr)
    assert(stale.as[Long].head() == boxIds(pts, xr, yr).size.toLong + 5L)
  }
}
