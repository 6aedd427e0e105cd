package graft

import org.apache.spark.sql.functions._
import graft.sources.GeoParquet

/** Scoped curve compaction ([[GeoParquet.compactCurveScoped]]): only
  * overlap-pressured key ranges are rewritten, untouched files stay
  * byte-identical, reads stay correct through the journaled commit
  * (roll-forward heal), and pending deletes apply physically to the
  * rewritten scope.
  */
class ScopedCompactSpec extends SparkSpec {
  import spark.implicits._

  private def p = graft.core.Tables.eventsPoints(spark, sf)
    .select("id", "x", "y", "z")

  /** md5 of every data file under the layout, by file name. */
  private def checksums(dir: String): Map[String, String] = {
    val d = new java.io.File(dir)
    d.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map { f =>
        val md = java.security.MessageDigest.getInstance("MD5")
        f.getName -> md.digest(
          java.nio.file.Files.readAllBytes(f.toPath))
          .map("%02x".format(_)).mkString
      }.toMap
  }

  /** Max sweep depth of the manifest's [k0,k1] intervals. */
  private def overlapDepth(dir: String): Int = {
    val ranges = spark.read.parquet(s"$dir/_manifest")
      .select("k0", "k1").as[(Long, Long)].collect().sortBy(_._1)
    val ends = ranges.map(_._2).sorted
    var depth = 0; var maxDepth = 0; var e = 0
    ranges.foreach { case (lo, _) =>
      while (e < ends.length && ends(e) < lo) { depth -= 1; e += 1 }
      depth += 1; maxDepth = maxDepth.max(depth)
    }
    maxDepth
  }

  /** A curve layout with overlap pressure concentrated in one key
    * region: a 4-file base plus 6 single-file appends of the same
    * narrow x-band.
    */
  private def pressured(): String = {
    val dir = java.nio.file.Files.createTempDirectory("scomp").toString
    GeoParquet.writeZOrdered(p.filter($"id" % 8 === 0), dir, 250.0, nFiles = 4)
    GeoParquet.writeManifest(spark, dir)
    (1 to 6).foreach { i =>
      GeoParquet.appendCurve(
        p.filter($"id" % 8 === i && $"x" >= 0 && $"x" < 250.0), dir, 250.0)
    }
    dir
  }

  test("scoped compact rewrites only the pressured ranges, byte-identical elsewhere") {
    val dir = pressured()
    val before = checksums(dir)
    val expect = GeoParquet.readMerged(spark, dir)
      .select("id", "x", "y", "z").localCheckpoint()
    assert(overlapDepth(dir) > 4, s"test bed lacks pressure: ${overlapDepth(dir)}")
    val rewritten = GeoParquet.compactCurveScoped(spark, dir,
      filesPerRun = 8, maxOverlap = 4)
    assert(rewritten > 0 && rewritten < before.size,
      s"expected a proper-subset rewrite, got $rewritten of ${before.size}")
    val after = checksums(dir)
    // untouched files survive byte-for-byte
    val untouched = before.keySet.intersect(after.keySet)
    assert(untouched.nonEmpty)
    untouched.foreach(f => assert(before(f) == after(f), s"$f was touched"))
    // pressure is gone, manifest is fresh, reads are exact
    assert(overlapDepth(dir) <= 4, s"still pressured: ${overlapDepth(dir)}")
    assert(GeoParquet.manifestFresh(spark, dir, verify = true))
    val got = GeoParquet.queryBoxCurve(spark, dir,
      (-1000.0, 1000.0), (-1000.0, 1000.0), 250.0)
      .select("id", "x", "y", "z")
    assert(got.exceptAll(expect).count() == 0 &&
      expect.exceptAll(got).count() == 0)
    // no-pressure layouts are left alone
    assert(GeoParquet.compactCurveScoped(spark, dir,
      filesPerRun = 8, maxOverlap = 4) == 0)
  }

  test("pending deletes apply physically to the scope, survivors keep subtracting") {
    val dir = pressured()
    GeoParquet.deleteWhere(spark, dir, $"id" % 16 === 0)
    val expect = GeoParquet.readMerged(spark, dir)
      .select("id", "x", "y", "z").localCheckpoint()
    assert(GeoParquet.compactCurveScoped(spark, dir,
      filesPerRun = 8, maxOverlap = 4) > 0)
    val got = GeoParquet.readMerged(spark, dir).select("id", "x", "y", "z")
    assert(got.exceptAll(expect).count() == 0 &&
      expect.exceptAll(got).count() == 0)
    assert(got.filter($"id" % 16 === 0).count() == 0)
  }

  test("a committed stage heals roll-forward; an uncommitted one is void") {
    val dir = pressured()
    val expect = GeoParquet.readMerged(spark, dir)
      .select("id", "x", "y", "z").localCheckpoint()
    // hand-build the crash state "died right after _commit": pick two
    // overlapping files, stage their exact union as the rewrite,
    // nothing moved yet
    val m = spark.read.parquet(s"$dir/_manifest")
      .orderBy(desc("epoch")).limit(2)
      .select("file").as[String].collect().toSeq
    val stage = s"$dir/_compact_staging/testcrash"
    spark.read.parquet(m.map(f => s"$dir/$f"): _*)
      .repartitionByRange(1, col("zkey")).sortWithinPartitions("zkey")
      .write.parquet(s"$stage/data")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$stage/_doomed"),
      m.mkString("\n").getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$stage/_commit"),
      "1".getBytes)
    GeoParquet.healCompactStage(spark, dir, voidSweepAgeMs = 0L)
    assert(!new java.io.File(s"$dir/_compact_staging/testcrash").exists())
    assert(GeoParquet.manifestFresh(spark, dir, verify = true))
    val got = GeoParquet.readMerged(spark, dir).select("id", "x", "y", "z")
    assert(got.exceptAll(expect).count() == 0 &&
      expect.exceptAll(got).count() == 0)
    // an UNcommitted stage is crash debris from before the commit
    // point: dropped wholesale, the layout unchanged
    val stage2 = s"$dir/_compact_staging/void1"
    new java.io.File(s"$stage2").mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$stage2/_doomed"),
      "nothing".getBytes)
    GeoParquet.healCompactStage(spark, dir, voidSweepAgeMs = 0L)
    assert(!new java.io.File(stage2).exists())
    val got2 = GeoParquet.readMerged(spark, dir).select("id", "x", "y", "z")
    assert(got2.exceptAll(expect).count() == 0 &&
      expect.exceptAll(got2).count() == 0)
  }
}
