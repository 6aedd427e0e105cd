package graft

import org.apache.spark.sql.functions._
import graft.sources.GeoParquet

/** Add-column schema evolution on manifested layouts: the `_schema`
  * sidecar + declared-schema reads (no mergeSchema footer storm).
  * Old files null-fill columns they predate; type changes refuse;
  * the manifest's own schema stays uniform across evolved appends.
  */
class EvolveSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: Seq[(Long, Double, Double, Double)]) =
    rows.toDF("id", "x", "y", "z")

  private def freshLayout(): String = {
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    GeoParquet.write(mk(Seq(
      (1L, 10.0, 10.0, 1.0), (2L, 510.0, 10.0, 2.0),
      (3L, 10.0, 510.0, 3.0))), dir, 500.0)
    GeoParquet.writeManifest(spark, dir)
    dir
  }

  test("widening append: old files read the new column as null, pruned reads serve the union") {
    val dir = freshLayout()
    GeoParquet.appendWithManifest(
      Seq((4L, 20.0, 20.0, 4.0, "en"), (5L, 520.0, 520.0, 5.0, "fr"))
        .toDF("id", "x", "y", "z", "lang"),
      dir, 500.0)
    val merged = GeoParquet.readMerged(spark, dir)
    assert(merged.columns.contains("lang"))
    val byId = merged.select("id", "lang").as[(Long, Option[String])]
      .collect().toMap
    assert(byId(1L).isEmpty && byId(2L).isEmpty && byId(3L).isEmpty)
    assert(byId(4L).contains("en") && byId(5L).contains("fr"))
    // the manifest stayed fresh through the evolved append, so this is
    // the PRUNED path — and it serves the union schema too
    assert(GeoParquet.manifestFresh(spark, dir, verify = false))
    val box = GeoParquet.queryBoxViaManifest(spark, dir, (0.0, 100.0), (0.0, 100.0))
    assert(box.select("id", "lang").as[(Long, Option[String])].collect().toSet ==
      Set((1L, None), (4L, Some("en"))))
  }

  test("narrowing batch: its rows read the missing column as null; stats prune stays sound") {
    val dir = freshLayout()
    // batch without z — its manifest z0/z1 land as typed nulls, its
    // rows read z-null; no reader breaks and no file is mis-pruned
    GeoParquet.appendWithManifest(
      Seq((6L, 30.0, 30.0)).toDF("id", "x", "y"), dir, 500.0)
    val merged = GeoParquet.readMerged(spark, dir)
    assert(merged.filter($"id" === 6L).select("z").as[Option[Double]]
      .collect().toSeq == Seq(None))
    // manifest schema is UNIFORM (no mixed part-file schemas)
    val m = spark.read.parquet(s"$dir/_manifest")
    assert(m.columns.contains("z0") && m.count() > 3)
    // min/max pushdown still answers: the z-less file contributes
    // nothing to min/max (null stats == all-null rows), count includes it
    val mm = GeoParquet.minMaxBoxViaManifest(spark, dir, (0.0, 1000.0), (0.0, 1000.0))
      .as[(Long, Option[Double], Option[Double])].collect().head
    assert(mm._1 == 4L && mm._2.contains(1.0) && mm._3.contains(3.0))
  }

  test("type change refuses instead of silently casting") {
    val dir = freshLayout()
    val e = intercept[IllegalArgumentException] {
      GeoParquet.appendWithManifest(
        Seq((7L, 40.0, 40.0, "not-a-double")).toDF("id", "x", "y", "z"),
        dir, 500.0)
    }
    assert(e.getMessage.contains("cannot change column z"))
  }

  test("deleteWhere on an evolved column; compaction carries the declared schema") {
    val dir = freshLayout()
    GeoParquet.appendWithManifest(
      Seq((4L, 20.0, 20.0, 4.0, "en"), (5L, 520.0, 520.0, 5.0, "fr"))
        .toDF("id", "x", "y", "z", "lang"),
      dir, 500.0)
    // predicate on the evolved column — old files (lang null) unmatched
    GeoParquet.deleteWhere(spark, dir, $"lang" === "fr")
    assert(GeoParquet.readMerged(spark, dir).select("id").as[Long]
      .collect().toSet == Set(1L, 2L, 3L, 4L))
    // compaction rewrites every file with the union schema and carries
    // `_schema` through the swap; reads stay whole
    GeoParquet.compact(spark, dir)
    GeoParquet.writeManifest(spark, dir)
    assert(GeoParquet.layoutSchema(spark, dir).isDefined)
    val after = GeoParquet.queryBoxViaManifest(spark, dir, (0.0, 1000.0), (0.0, 1000.0))
      .select("id", "lang").as[(Long, Option[String])].collect().toSet
    assert(after == Set((1L, None), (2L, None), (3L, None), (4L, Some("en"))))
  }

  test("curve layouts evolve too: appendCurve widens, BIGMIN reads serve the union") {
    val dir = java.nio.file.Files.createTempDirectory("evolve_c").toString
    GeoParquet.writeZOrdered(mk(Seq(
      (1L, 10.0, 10.0, 1.0), (2L, 510.0, 510.0, 2.0))), dir, 50.0, 2)
    GeoParquet.writeManifest(spark, dir)
    GeoParquet.appendCurve(
      Seq((3L, 20.0, 20.0, 3.0, "en")).toDF("id", "x", "y", "z", "lang"),
      dir, 50.0)
    assert(GeoParquet.layoutSchema(spark, dir)
      .exists(_.fieldNames.contains("lang")))
    // the pruned curve read path serves the union schema with nulls
    // for files predating the column
    val got = GeoParquet.queryBoxCurve(spark, dir, (0.0, 600.0), (0.0, 600.0), 50.0)
      .select("id", "lang").as[(Long, Option[String])].collect().toSet
    assert(got == Set((1L, None), (2L, None), (3L, Some("en"))))
    // type change refuses on the curve path too
    val e = intercept[IllegalArgumentException] {
      GeoParquet.appendCurve(
        Seq((4L, 30.0, 30.0, "bad")).toDF("id", "x", "y", "z"), dir, 50.0)
    }
    assert(e.getMessage.contains("cannot change column z"))
  }

  test("first evolution through the stale-manifest fallback: writeManifest records the sidecar") {
    // finding-2 scenario: the manifest goes stale, then a WIDENING
    // batch lands through the plain-append fallback — the evolution
    // block never ran, so the sidecar (recorded unconditionally by
    // writeManifest since the fix) predates the new column and
    // declared-schema reads hide it.  The rebuild must reconcile the
    // file union into the sidecar, making the column visible again.
    val dir = freshLayout()
    // stale the manifest, then land a widening batch via the fallback
    GeoParquet.append(mk(Seq((9L, 60.0, 60.0, 9.0))), dir, 500.0)
    GeoParquet.appendWithManifest(
      Seq((10L, 70.0, 70.0, 10.0, "de")).toDF("id", "x", "y", "z", "lang"),
      dir, 500.0) // stale manifest => plain-append fallback, no evolution block
    val before = GeoParquet.layoutSchema(spark, dir)
    assert(before.exists(!_.fieldNames.contains("lang")),
      "sidecar must predate the fallback-landed column")
    assert(!GeoParquet.readMerged(spark, dir).columns.contains("lang"))
    GeoParquet.writeManifest(spark, dir)
    val s = GeoParquet.layoutSchema(spark, dir)
    assert(s.exists(_.fieldNames.contains("lang")))
    val byId = GeoParquet.readMerged(spark, dir)
      .select("id", "lang").as[(Long, Option[String])].collect().toMap
    assert(byId(10L).contains("de") && byId(9L).isEmpty && byId(1L).isEmpty)
  }

  test("writeManifest repairs a fallback append's unseen column into the sidecar") {
    val dir = freshLayout()
    GeoParquet.appendWithManifest(
      Seq((4L, 20.0, 20.0, 4.0, "en")).toDF("id", "x", "y", "z", "lang"),
      dir, 500.0)
    // simulate a stale-manifest degradation: a plain append lands a
    // SECOND new column with no sidecar update
    GeoParquet.append(
      Seq((8L, 50.0, 50.0, 8.0, 9.9)).toDF("id", "x", "y", "z", "score"),
      dir, 500.0)
    // declared-schema reads hide nothing after the repair verb runs
    GeoParquet.writeManifest(spark, dir)
    val s = GeoParquet.layoutSchema(spark, dir).get
    assert(s.fieldNames.contains("lang") && s.fieldNames.contains("score"))
    val row8 = GeoParquet.readMerged(spark, dir).filter($"id" === 8L)
      .select("score").as[Option[Double]].collect().toSeq
    assert(row8 == Seq(Some(9.9)))
  }
}
