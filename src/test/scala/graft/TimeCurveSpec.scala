package graft

import org.apache.spark.sql.functions._
import graft.sources.GeoParquet

/** TIME-major curve layout ([[GeoParquet.writeTimeCurve]]): files are
  * t-disjoint (range partition on t) and zkey-sorted within, so a
  * recent-window read prunes exactly — strictly fewer files than the
  * same query against a space-major curve layout whose per-file t
  * envelopes all span the whole ingest range.
  */
class TimeCurveSpec extends SparkSpec {
  import spark.implicits._

  private def p = graft.core.Tables.eventsPoints(spark, sf)
    .select("id", "x", "y", "z", "t")

  private val box = ((-300.0, 300.0), (-300.0, 300.0))
  private val window = (1705000000000L, 1705200000000L)

  test("time-curve files are t-disjoint and the window read opens only its runs") {
    val dirT = java.nio.file.Files.createTempDirectory("tcv").toString
    val dirZ = java.nio.file.Files.createTempDirectory("tcz").toString
    GeoParquet.writeTimeCurve(p, dirT, 250.0, nFiles = 16)
    GeoParquet.writeManifest(spark, dirT)
    GeoParquet.writeZOrdered(p, dirZ, 250.0, nFiles = 16)
    GeoParquet.writeManifest(spark, dirZ)

    // manifest t-runs of the time-major layout are pairwise disjoint
    val runs = spark.read.parquet(s"$dirT/_manifest")
      .select("t0", "t1").orderBy("t0")
      .as[(Long, Long)].collect()
    assert(runs.length > 4)
    runs.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2,
        s"t-runs overlap: [..,$hi] then [$lo2,..]")
      case _ =>
    }

    val gotT = GeoParquet.queryBoxTimeViaManifest(spark, dirT,
      box._1, box._2, window)
    val gotZ = GeoParquet.queryBoxTimeViaManifest(spark, dirZ,
      box._1, box._2, window)
    // identical answers …
    val a = gotT.select("id", "x", "y", "z", "t")
    val b = gotZ.select("id", "x", "y", "z", "t")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    assert(a.count() > 0)
    // … but the time-major layout opens strictly fewer files: the
    // space-major layout's shuffled files each span ~the whole month,
    // so its t envelopes prune (almost) nothing
    val openedT = gotT.inputFiles.length
    val openedZ = gotZ.inputFiles.length
    assert(openedT < openedZ,
      s"expected time pruning: time-major opened $openedT, " +
        s"space-major opened $openedZ")
    // and the window (~8% of the range) opens a small fraction
    assert(openedT <= 4, s"expected <=4 of 16 t-runs, opened $openedT")
  }

  test("time-curve files still prune boxes inside each t-run (zkey row groups)") {
    val dir = java.nio.file.Files.createTempDirectory("tcb").toString
    GeoParquet.writeTimeCurve(p, dir, 250.0, nFiles = 8)
    GeoParquet.writeManifest(spark, dir)
    // the persisted zkey rides every file, sorted — the curve read
    // path still answers (file k0/k1 are wide by design; row-group
    // stats on the sorted key do the intra-file pruning)
    val got = GeoParquet.queryBoxCurve(spark, dir,
      (-300.0, 300.0), (-300.0, 300.0), 250.0)
    val expect = p.filter($"x" >= -300 && $"x" < 300 &&
      $"y" >= -300 && $"y" < 300)
    assert(got.select("id", "x", "y", "z", "t").exceptAll(expect).count() == 0 &&
      expect.exceptAll(got.select("id", "x", "y", "z", "t")).count() == 0)
  }
}
