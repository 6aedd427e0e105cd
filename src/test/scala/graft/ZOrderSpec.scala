package graft

import org.apache.spark.sql.functions._
import graft.functions.ZOrder
import graft.sources.GeoParquet

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zkey is a bijection: decode inverts encode across the signed range") {
    val cells = Seq((-1048576L, -1048576L), (-1L, 1L), (0L, 0L), (7L, -3L),
      (1048575L, 1048575L), (20L, -20L), (-17L, 13L))
    val keyed = cells.toDF("cx", "cy")
      .select(ZOrder.zkey(col("cx"), col("cy")).as("k")).as[Long].collect()
    assert(keyed.toSeq.map(ZOrder.decode) == cells)
    assert(keyed.distinct.length == cells.length)
  }

  test("hilbert: adjacency (the defining property), inverse, and Spark/driver parity") {
    import graft.functions.Hilbert
    // consecutive d values decode to Manhattan-adjacent cells — the
    // property that distinguishes a real Hilbert walk from Z-order's
    // corner jumps; probe ranges far apart on the 2^42-cell curve
    for (base <- Seq(0L, 12345678L, (1L << 41) + 977L)) {
      var prev = Hilbert.d2xy(base)
      for (d <- base + 1 to base + 500) {
        val cur = Hilbert.d2xy(d)
        assert(math.abs(cur._1 - prev._1) + math.abs(cur._2 - prev._2) == 1,
          s"jump at d=$d: $prev -> $cur")
        assert(Hilbert.xy2d(cur._1, cur._2) == d)   // inverse round-trip
        prev = cur
      }
    }
    // Spark column walk AND native expression == driver loop, incl.
    // signed extremes
    val cells = Seq((-1048576L, -1048576L), (-1L, 1L), (0L, 0L), (20L, -20L),
      (1048575L, 1048575L), (-313L, 7772L))
    val got = Hilbert.withDkey(cells.toDF("cell_x", "cell_y"), "cell_x", "cell_y", "d")
      .withColumn("dn", Hilbert.dkey(col("cell_x"), col("cell_y")))
      .select("cell_x", "cell_y", "d", "dn").as[(Long, Long, Long, Long)].collect()
    got.foreach { case (x, y, d, dn) =>
      assert(d == Hilbert.xy2d(x, y) && dn == d, s"($x,$y)")
    }
    // SQL surface
    graft.GraftExtensions.register(spark)
    assert(spark.sql("SELECT hilbert_key(20L, -20L) AS k").as[Long].head() ==
      Hilbert.xy2d(20L, -20L))
  }

  test("hilbert-clustered layout: per-file chunks at least as compact as z-order") {
    val dir = java.nio.file.Files.createTempDirectory("hilb").toString
    val pts = graft.core.Tables.eventsPoints(spark, sf)
    GeoParquet.writeHilbertClustered(pts, dir, delta = 50.0, nFiles = 16)
    val boxes = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(((max("x") - min("x")) * (max("y") - min("y"))).as("area"))
      .as[(String, Double)].collect()
    assert(boxes.length >= 8)
    val sum = boxes.map(_._2).sum
    assert(sum < 0.35 * boxes.length * 2000.0 * 2000.0,
      s"sum of per-file bbox areas $sum over ${boxes.length} files")
  }

  test("manifest-planned box query: same rows, fraction of the files opened") {
    val dir = java.nio.file.Files.createTempDirectory("manif").toString
    val pts = graft.core.Tables.eventsPoints(spark, sf)
    GeoParquet.writeZOrdered(pts, dir, delta = 50.0, nFiles = 16)
    GeoParquet.writeManifest(spark, dir)
    val xr = (0.0, 200.0); val yr = (0.0, 200.0)
    val viaManifest = GeoParquet.queryBoxViaManifest(spark, dir, xr, yr)
    val direct = spark.read.parquet(dir)
      .filter($"x" >= xr._1 && $"x" < xr._2 && $"y" >= yr._1 && $"y" < yr._2)
    assert(viaManifest.select("id").as[Long].collect().sorted.toSeq ==
           direct.select("id").as[Long].collect().sorted.toSeq)
    assert(direct.count() > 0)
    val total = spark.read.parquet(dir).inputFiles.length
    assert(viaManifest.inputFiles.length <= total / 2,
      s"${viaManifest.inputFiles.length} of $total files opened for a 1% box")
    // manifest sidecar is invisible to plain readers of the directory
    assert(!spark.read.parquet(dir).inputFiles.exists(_.contains("_manifest")))
  }

  test("stale manifest: append() bumps the epoch, query falls back and returns appended rows") {
    val dir = java.nio.file.Files.createTempDirectory("stale").toString
    val pts = graft.core.Tables.eventsPoints(spark, sf)
    GeoParquet.write(pts, dir, delta = 50.0)
    GeoParquet.writeManifest(spark, dir)
    assert(GeoParquet.readEpoch(spark, dir) == 0L)
    val xr = (0.0, 100.0); val yr = (0.0, 100.0)
    val before = GeoParquet.queryBoxViaManifest(spark, dir, xr, yr)
      .select("id").as[Long].collect().toSet
    // ingest a batch with rows inside the box — append() must bump
    // the epoch so the (now stale) manifest stops pruning
    val batch = pts.limit(3)
      .withColumn("id", col("id") + 9000000L)
      .withColumn("x", lit(10.0)).withColumn("y", lit(10.0))
    GeoParquet.append(batch, dir, delta = 50.0)
    assert(GeoParquet.readEpoch(spark, dir) == 1L)
    val afterIds = GeoParquet.queryBoxViaManifest(spark, dir, xr, yr)
      .select("id").as[Long].collect().toSet
    assert((afterIds -- before).exists(_ >= 9000000L),
      "appended rows dropped by a stale-manifest pruned read")
    // re-manifesting restores the pruned plan, appended rows included
    GeoParquet.writeManifest(spark, dir)
    val pruned = GeoParquet.queryBoxViaManifest(spark, dir, xr, yr)
      .select("id").as[Long].collect().toSet
    assert(pruned == afterIds)
  }

  test("relocated layout: root-relative manifest entries survive a directory move (change_root)") {
    // the reference stores an absolute dir_root in every index and
    // ships fix_dir_root.py to repair it after a move
    // (geo_index.py:193-205); root-relative manifests make the move
    // itself sufficient — no rewrite pass
    val dirA = java.nio.file.Files.createTempDirectory("relocA").toString
    val pts = graft.core.Tables.eventsPoints(spark, sf)
    GeoParquet.writeZOrdered(pts, dirA, delta = 50.0, nFiles = 16)
    GeoParquet.writeManifest(spark, dirA)
    val xr = (0.0, 200.0); val yr = (0.0, 200.0)
    val want = GeoParquet.queryBoxViaManifest(spark, dirA, xr, yr)
      .select("id").as[Long].collect().sorted.toSeq
    assert(want.nonEmpty)
    val dirB = dirA + ".moved"
    val fs = new org.apache.hadoop.fs.Path(dirA)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dirA),
      new org.apache.hadoop.fs.Path(dirB)))
    // pruned reads at the NEW root: same rows, still a fraction of the
    // files, and the verify listing agrees with the relocated manifest
    val moved = GeoParquet.queryBoxViaManifest(spark, dirB, xr, yr, verify = true)
    assert(moved.select("id").as[Long].collect().sorted.toSeq == want)
    val total = spark.read.parquet(dirB).inputFiles.length
    assert(moved.inputFiles.length <= total / 2)
    val movedCurve = GeoParquet.queryBoxCurve(spark, dirB, xr, yr, delta = 50.0)
    assert(movedCurve.select("id").as[Long].collect().sorted.toSeq == want)
  }

  test("appendWithManifest: O(batch) manifest maintenance keeps pruned reads fresh") {
    val dir = java.nio.file.Files.createTempDirectory("incman").toString
    val pts = graft.core.Tables.eventsPoints(spark, sf)
    GeoParquet.write(pts, dir, delta = 50.0)
    GeoParquet.writeManifest(spark, dir)
    val batch = pts.limit(3)
      .withColumn("id", col("id") + 9200000L)
      .withColumn("x", lit(10.0)).withColumn("y", lit(10.0))
    GeoParquet.appendWithManifest(batch, dir, delta = 50.0)
    // no writeManifest re-run — epochs must ALREADY agree (fresh)
    assert(GeoParquet.readEpoch(spark, dir) == 1L)
    val xr = (0.0, 100.0); val yr = (0.0, 100.0)
    // verify=true proves the incrementally-appended manifest matches
    // a full listing BOTH ways — and the read is pruned, not fallback
    val q = GeoParquet.queryBoxViaManifest(spark, dir, xr, yr, verify = true)
    val ids = q.select("id").as[Long].collect().toSet
    assert(ids.exists(_ >= 9200000L), "appended rows missing from pruned read")
    val total = spark.read.parquet(dir).inputFiles.length
    assert(q.inputFiles.length < total,
      s"read ${q.inputFiles.length} of $total files — fallback, not pruned")
    // second increment chains the epoch
    GeoParquet.appendWithManifest(batch.withColumn("id", col("id") + 100L),
      dir, delta = 50.0)
    assert(GeoParquet.readEpoch(spark, dir) == 2L)
    val again = GeoParquet.queryBoxViaManifest(spark, dir, xr, yr, verify = true)
      .select("id").as[Long].collect().toSet
    assert(again.exists(_ >= 9200100L))
  }

  test("compact() destroys the manifest but the query degrades to a live scan, not a throw") {
    val dir = java.nio.file.Files.createTempDirectory("compactq").toString
    val pts = graft.core.Tables.eventsPoints(spark, sf)
    GeoParquet.write(pts, dir, delta = 50.0)
    GeoParquet.writeManifest(spark, dir)
    GeoParquet.append(pts.limit(2)
      .withColumn("id", col("id") + 9100000L)
      .withColumn("x", lit(12.0)).withColumn("y", lit(12.0)), dir, delta = 50.0)
    GeoParquet.compact(spark, dir)
    // the swap dropped _manifest and _manifest_epoch; epoch survived+bumped
    assert(GeoParquet.readEpoch(spark, dir) == 2L)
    val got = GeoParquet.queryBoxViaManifest(spark, dir, (0.0, 100.0), (0.0, 100.0))
      .select("id").as[Long].collect().toSet
    assert(got.exists(_ >= 9100000L), "post-compact query lost appended rows")
  }

  test("verify=true catches an external deletion the epoch cannot see") {
    val dir = java.nio.file.Files.createTempDirectory("staledel").toString
    val pts = graft.core.Tables.eventsPoints(spark, sf)
    GeoParquet.write(pts, dir, delta = 50.0)
    GeoParquet.writeManifest(spark, dir)
    // external cleanup deletes one data file without touching _epoch
    val victim = spark.read.parquet(dir).inputFiles
      .filterNot(f => f.contains("_manifest")).head
    val p = new org.apache.hadoop.fs.Path(new java.net.URI(victim).getPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(p, false))
    val xr = (-1000.0, 1000.0); val yr = (-1000.0, 1000.0)
    val direct = spark.read.parquet(dir)
      .filter($"x" >= xr._1 && $"x" < xr._2 && $"y" >= yr._1 && $"y" < yr._2)
      .count()
    // both-ways file-set comparison → fallback to a live listing; the
    // query reflects what is actually on disk instead of handing the
    // scan a dead file path
    val viaVerify = GeoParquet.queryBoxViaManifest(spark, dir, xr, yr, verify = true)
    assert(viaVerify.count() == direct)
  }

  test("z-ordered layout: every file covers a spatially compact region") {
    val dir = java.nio.file.Files.createTempDirectory("zord").toString
    val pts = graft.core.Tables.eventsPoints(spark, sf)
    GeoParquet.writeZOrdered(pts, dir, delta = 50.0, nFiles = 16)
    // per-file bounding boxes over the full [-1000,1000)² extent
    val boxes = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(((max("x") - min("x")) * (max("y") - min("y"))).as("area"))
      .as[(String, Double)].collect()
    assert(boxes.length >= 8)
    val fullArea = 2000.0 * 2000.0
    // random (unclustered) 16-way split ⇒ every chunk spans ~the full
    // extent (sum ≈ 16·full); z-order chunks must be far tighter
    val sum = boxes.map(_._2).sum
    assert(sum < 0.35 * boxes.length * fullArea,
      s"sum of per-file bbox areas $sum vs ${boxes.length} x $fullArea")
    // and a 2-D box probe must skip most files on x/y min-max alone
    val touching = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
      .filter($"x1" >= 0.0 && $"x0" < 200.0 && $"y1" >= 0.0 && $"y0" < 200.0)
      .count()
    assert(touching <= boxes.length / 2,
      s"$touching of ${boxes.length} files intersect a 1% box")
  }
}
