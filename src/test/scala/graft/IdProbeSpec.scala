package graft

import org.apache.spark.sql.functions._
import graft.sources.GeoParquet

/** Manifest id-membership filters: point probes open only
  * might-contain files, never lose a row (no false negatives), ride
  * appended batches, subtract deletes, and degrade to full scans when
  * the manifest cannot answer.
  */
class IdProbeSpec extends SparkSpec {
  import spark.implicits._

  private def p = graft.core.Tables.eventsPoints(spark, sf)
    .select("id", "x", "y", "z")

  test("id probe prunes to might-contain files and matches the exact filter") {
    val dir = java.nio.file.Files.createTempDirectory("idp").toString
    GeoParquet.write(p, dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    val m = spark.read.parquet(s"$dir/_manifest")
    assert(m.columns.contains("id_bloom"))
    val nFiles = m.count()
    assert(nFiles > 10, s"need a multi-file layout to prove pruning ($nFiles)")
    val want = Seq(10L, 501L, 1234L)
    val got = GeoParquet.queryIdsViaManifest(spark, dir, want)
    // exactness: same rows as the unpruned filter
    val expect = p.filter($"id".isin(want: _*))
    assert(got.select("id", "x", "y", "z").exceptAll(expect).count() == 0 &&
      expect.exceptAll(got.select("id", "x", "y", "z")).count() == 0)
    assert(got.count() == expect.count() && got.count() >= 2)
    // the probe actually pruned: explicit file-list reads report their
    // inputs faithfully (manifest-pruned, not partition-pruned)
    val opened = got.inputFiles.length
    assert(opened > 0 && opened < nFiles,
      s"expected bloom pruning, opened $opened of $nFiles")
  }

  test("bloom candidates prune the upsert position lookup, MERGE stays exact") {
    val dir = java.nio.file.Files.createTempDirectory("idp3").toString
    GeoParquet.write(p, dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    val nFiles = spark.read.parquet(s"$dir/_manifest").count()
    // the distributed probe answers, and answers selectively
    val cand = GeoParquet.bloomCandidateFiles(spark, dir,
      Seq(10L, 501L).toDF("id"))
    assert(cand.isDefined)
    assert(cand.get.nonEmpty && cand.get.size < nFiles,
      s"expected selective candidates, got ${cand.map(_.size)} of $nFiles")
    // and the MERGE riding it keeps the exactly-once contract
    GeoParquet.upsertPositional(
      p.filter($"id" % 13 === 0).withColumn("z", $"z" + 500.0),
      dir, "id", 250.0)
    val r = GeoParquet.readMerged(spark, dir).select("id", "x", "y", "z")
    val expect = p.withColumn("z",
      when($"id" % 13 === 0, $"z" + 500.0).otherwise($"z"))
    assert(r.exceptAll(expect).count() == 0 && expect.exceptAll(r).count() == 0)
  }

  test("appended batches carry filters; deletes subtract; stale manifest degrades") {
    val dir = java.nio.file.Files.createTempDirectory("idp2").toString
    GeoParquet.write(p.filter($"id" % 2 === 0), dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    GeoParquet.appendWithManifest(p.filter($"id" % 2 === 1), dir, 250.0)
    // odd id 501 lives only in the APPENDED files — its manifest rows
    // must carry a filter that hits
    assert(GeoParquet.queryIdsViaManifest(spark, dir, Seq(501L))
      .select("id").as[Long].collect().toSeq == Seq(501L))
    // merge-on-read delete rides the probe like every other reader
    GeoParquet.deleteWhere(spark, dir, $"id" === 501L)
    assert(GeoParquet.queryIdsViaManifest(spark, dir, Seq(501L)).isEmpty)
    // stale manifest: plain append outside it → fallback scan, exact
    GeoParquet.append(
      Seq((900002L, 5.0, 5.0, 0.0)).toDF("id", "x", "y", "z"), dir, 250.0)
    assert(!GeoParquet.manifestFresh(spark, dir, verify = false))
    assert(GeoParquet.queryIdsViaManifest(spark, dir, Seq(900002L, 10L))
      .select("id").as[Long].collect().toSet == Set(900002L, 10L))
  }
}
