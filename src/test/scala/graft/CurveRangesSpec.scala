package graft

import graft.functions.{CurveRanges, Hilbert, ZOrder}
import graft.sources.GeoParquet
import org.apache.spark.sql.functions._

/** Pins the BIGMIN planner kernel (CurveRanges.decompose) and the
  * curve-range reader built on it (GeoParquet.queryBoxCurve):
  * coverage (every in-box cell's key falls in some emitted range),
  * exactness when the budget allows, disjointness, budget respect —
  * and, end-to-end, that a box query over a curve-clustered layout
  * opens FEWER files than the x/y-envelope plan on the same layout
  * while returning the same rows.
  */
class CurveRangesSpec extends SparkSpec {
  import spark.implicits._

  private val curves = Seq[(String, CurveRanges.Curve, (Long, Long) => Long)](
    ("z", CurveRanges.Z, ZOrder.xy2z),
    ("h", CurveRanges.H, Hilbert.xy2d))

  private val boxes = Seq(
    // (cx0, cx1, cy0, cy1) — single cell, small aligned, small
    // unaligned, seam-straddling (crosses cell 0 where the top curve
    // bit flips), negative-only, and a tall rectangle
    (5L, 5L, 7L, 7L),
    (0L, 3L, 0L, 3L),
    (3L, 9L, 5L, 12L),
    (-3L, 4L, -2L, 3L),
    (-17L, -9L, -30L, -22L),
    (-1L, 1L, -8L, 6L))

  test("decompose: exact cover (no dead space) when the range budget allows — both curves") {
    for ((cname, curve, key) <- curves; (cx0, cx1, cy0, cy1) <- boxes) {
      // a generous budget: small boxes refine to cell level (floor
      // level 0) and never hit the merge loop, so the union must be
      // EXACTLY the box
      val ranges = CurveRanges.decompose(cx0, cx1, cy0, cy1, curve, maxRanges = 4096)
      val label = s"$cname [$cx0..$cx1]x[$cy0..$cy1]"
      assert(ranges.nonEmpty, label)
      // sorted and disjoint, with a true gap between consecutive runs
      ranges.sliding(2).foreach {
        case Seq((_, hi), (lo2, _)) => assert(hi + 1 < lo2, s"$label overlap/touch")
        case _                      => ()
      }
      val inBox = (for (cx <- cx0 to cx1; cy <- cy0 to cy1) yield key(cx, cy)).toSet
      inBox.foreach { k =>
        assert(ranges.exists { case (lo, hi) => k >= lo && k <= hi },
          s"$label cell key $k not covered")
      }
      val total = ranges.map { case (lo, hi) => hi - lo + 1 }.sum
      assert(total == inBox.size.toLong,
        s"$label covers $total keys, box has ${inBox.size}")
    }
  }

  test("decompose: default budget still covers (superset), respects maxRanges") {
    for ((cname, curve, key) <- curves; (cx0, cx1, cy0, cy1) <- boxes) {
      val ranges = CurveRanges.decompose(cx0, cx1, cy0, cy1, curve)
      assert(ranges.size <= 32, s"$cname budget blown: ${ranges.size}")
      for (cx <- cx0 to cx1; cy <- cy0 to cy1) {
        val k = key(cx, cy)
        assert(ranges.exists { case (lo, hi) => k >= lo && k <= hi },
          s"$cname [$cx0..$cx1]x[$cy0..$cy1] cell ($cx,$cy) lost under budget")
      }
    }
  }

  test("decompose: seeded random boxes — exact under a generous budget, both curves") {
    val rnd = new scala.util.Random(20260812L)
    for (_ <- 1 to 25; (cname, curve, key) <- curves) {
      val cx0 = rnd.nextLong(2000) - 1000
      val cy0 = rnd.nextLong(2000) - 1000
      val w = rnd.nextLong(12); val h = rnd.nextLong(12)
      val (cx1, cy1) = (cx0 + w, cy0 + h)
      val ranges = CurveRanges.decompose(cx0, cx1, cy0, cy1, curve, maxRanges = 4096)
      val inBox = (for (cx <- cx0 to cx1; cy <- cy0 to cy1) yield key(cx, cy)).toSet
      val covered = inBox.forall(k =>
        ranges.exists { case (lo, hi) => k >= lo && k <= hi })
      val total = ranges.map { case (lo, hi) => hi - lo + 1 }.sum
      assert(covered && total == inBox.size.toLong,
        s"$cname [$cx0..$cx1]x[$cy0..$cy1]: covered=$covered total=$total want=${inBox.size}")
    }
  }

  test("decompose: a huge box coarsens to superset runs within budget") {
    for ((cname, curve, key) <- curves) {
      val ranges = CurveRanges.decompose(-500L, 499L, -500L, 499L, curve, maxRanges = 16)
      assert(ranges.size <= 16, cname)
      for ((cx, cy) <- Seq((-500L, -500L), (499L, 499L), (0L, 0L), (-1L, 499L))) {
        val k = key(cx, cy)
        assert(ranges.exists { case (lo, hi) => k >= lo && k <= hi },
          s"$cname cell ($cx,$cy) lost by coarsening")
      }
    }
  }

  test("decompose: box outside the cell domain is empty, bad args throw") {
    assert(CurveRanges.decompose(1L << 21, (1L << 21) + 5, 0L, 5L, CurveRanges.Z).isEmpty)
    intercept[IllegalArgumentException] {
      CurveRanges.decompose(5L, 4L, 0L, 0L, CurveRanges.Z)
    }
  }

  test("queryBoxCurve: same rows as a direct filter, fewer files than the x/y-envelope plan") {
    for ((writeIt, cname) <- Seq(
        ((df: org.apache.spark.sql.DataFrame, dir: String) =>
          GeoParquet.writeZOrdered(df, dir, delta = 50.0, nFiles = 16), "z"),
        ((df: org.apache.spark.sql.DataFrame, dir: String) =>
          GeoParquet.writeHilbertClustered(df, dir, delta = 50.0, nFiles = 16), "h"))) {
      val dir = java.nio.file.Files.createTempDirectory(s"curve$cname").toString
      val pts = graft.core.Tables.eventsPoints(spark, sf)
      writeIt(pts, dir)
      GeoParquet.writeManifest(spark, dir)
      // a box straddling the curve seam at cell 0 — an x/y envelope
      // plan over-selects here because files spanning the seam have
      // huge bounding boxes; the key intervals don't care
      val xr = (-150.0, 150.0); val yr = (-150.0, 150.0)
      val viaCurve = GeoParquet.queryBoxCurve(spark, dir, xr, yr, delta = 50.0)
      val viaEnvelope = GeoParquet.queryBoxViaManifest(spark, dir, xr, yr)
      val direct = spark.read.parquet(dir)
        .filter($"x" >= xr._1 && $"x" < xr._2 && $"y" >= yr._1 && $"y" < yr._2)
      val want = direct.select("id").as[Long].collect().sorted.toSeq
      assert(want.nonEmpty)
      assert(viaCurve.select("id").as[Long].collect().sorted.toSeq == want, cname)
      assert(viaEnvelope.select("id").as[Long].collect().sorted.toSeq == want, cname)
      val total = spark.read.parquet(dir).inputFiles.length
      val nCurve = viaCurve.inputFiles.length
      val nEnvelope = viaEnvelope.inputFiles.length
      assert(nCurve < nEnvelope,
        s"$cname: curve plan opens $nCurve files, envelope plan $nEnvelope (of $total)")
    }
  }

  test("queryBoxCurve: stale manifest (epoch bumped since writeManifest) falls back, still correct") {
    val dir = java.nio.file.Files.createTempDirectory("curvestale").toString
    val pts = graft.core.Tables.eventsPoints(spark, sf)
    GeoParquet.writeZOrdered(pts, dir, delta = 50.0, nFiles = 8)
    GeoParquet.writeManifest(spark, dir)
    // out-of-band writer: a new file (same schema) with one in-box
    // row the manifest doesn't know about, plus the epoch bump the
    // writer contract requires
    val extra = spark.read.parquet(dir).limit(1)
      .withColumn("id", lit(9000001L))
      .withColumn("x", lit(10.0)).withColumn("y", lit(10.0))
      .withColumn("zkey", ZOrder.zkey(
        graft.operators.GeoOps.cellOf(lit(10.0), 50.0),
        graft.operators.GeoOps.cellOf(lit(10.0), 50.0)))
    extra.write.mode("append").parquet(dir)
    val epochFile = new org.apache.hadoop.fs.Path(s"$dir/_epoch")
    val fs = epochFile.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(epochFile, true)
    out.write("1".getBytes("UTF-8")); out.close()
    val got = GeoParquet.queryBoxCurve(spark, dir, (0.0, 50.0), (0.0, 50.0), delta = 50.0)
      .select("id").as[Long].collect().toSet
    assert(got.contains(9000001L), "appended row lost by a stale curve manifest read")
    // re-manifesting restores pruned reads and keeps the row
    GeoParquet.writeManifest(spark, dir)
    val again = GeoParquet.queryBoxCurve(spark, dir, (0.0, 50.0), (0.0, 50.0), delta = 50.0)
      .select("id").as[Long].collect().toSet
    assert(again.contains(9000001L))
  }
}
