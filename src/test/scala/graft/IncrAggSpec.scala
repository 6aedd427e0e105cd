package graft

import org.apache.spark.sql.functions._
import graft.sources.{GeoParquet, MaterializedAgg}

/** Incremental aggregate maintenance: the maintained per-bin state
  * must equal a from-scratch rollup after every refresh — through
  * appends (incremental merges), deletes and compaction (fallback
  * recomputes), and repeated refreshes (idempotent no-ops).
  */
class IncrAggSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: Seq[(Long, Double, Double, Double)]) =
    rows.toDF("id", "x", "y", "z")

  private def scratch(dir: String) =
    GeoParquet.readMerged(spark, dir)
      .groupBy(graft.operators.GeoOps.binOf(col("x"), 500.0).as("bin_x"),
        graft.operators.GeoOps.binOf(col("y"), 500.0).as("bin_y"))
      .agg(count("*").as("n"), sum("id").as("sum_id"),
        min("z").as("z_min"), max("z").as("z_max"))

  private def stateSet(stateDir: String) =
    MaterializedAgg.read(spark, stateDir)
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSet

  private def scratchSet(dir: String) =
    scratch(dir).as[(Long, Long, Long, Long, Double, Double)].collect().toSet

  test("maintained state equals from-scratch rollup through appends, delete, compaction") {
    val dir = java.nio.file.Files.createTempDirectory("incragg_l").toString
    val st = java.nio.file.Files.createTempDirectory("incragg_s").toString
    GeoParquet.write(mk(Seq(
      (1L, 10.0, 10.0, 1.0), (2L, 510.0, 10.0, 2.0))), dir, 500.0)
    GeoParquet.writeManifest(spark, dir)
    MaterializedAgg.refresh(spark, dir, st, 500.0)
    assert(stateSet(st) == scratchSet(dir))

    // two appends, ONE refresh: the delta spans two commit epochs
    GeoParquet.appendWithManifest(mk(Seq((3L, 20.0, 20.0, 0.5))), dir, 500.0)
    GeoParquet.appendWithManifest(mk(Seq(
      (4L, 520.0, 20.0, 9.0), (5L, 20.0, 520.0, 5.0))), dir, 500.0)
    val e = MaterializedAgg.refresh(spark, dir, st, 500.0)
    assert(e == GeoParquet.readEpoch(spark, dir))
    assert(stateSet(st) == scratchSet(dir))

    // refresh with nothing landed: a no-op that stays correct
    MaterializedAgg.refresh(spark, dir, st, 500.0)
    assert(stateSet(st) == scratchSet(dir))

    // pending delete: changelogs refuse deletes, so the refresh must
    // fall back to a full recompute — and subtract the doomed row
    GeoParquet.deleteWhere(spark, dir, $"id" === 2L)
    MaterializedAgg.refresh(spark, dir, st, 500.0)
    assert(stateSet(st) == scratchSet(dir))
    assert(!stateSet(st).exists(r => r._4 == 2L && r._3 == 1L))

    // compaction resets history; the next refresh must recompute, not
    // merge the whole layout on top of the stored state
    GeoParquet.compact(spark, dir)
    GeoParquet.writeManifest(spark, dir)
    GeoParquet.appendWithManifest(mk(Seq((6L, 30.0, 30.0, 3.0))), dir, 500.0)
    MaterializedAgg.refresh(spark, dir, st, 500.0)
    assert(stateSet(st) == scratchSet(dir))
    val total = MaterializedAgg.read(spark, st).agg(sum("n")).head().getLong(0)
    assert(total == 5L) // 6 rows minus the deleted one
  }

  test("curve layouts compose: appendCurve batches merge incrementally too") {
    // the refresh rides the manifest's epoch axis, which appendCurve
    // maintains exactly like appendWithManifest — so the materialized
    // view works unchanged over a z-ordered layout
    val dir = java.nio.file.Files.createTempDirectory("incragg3_l").toString
    val st = java.nio.file.Files.createTempDirectory("incragg3_s").toString
    GeoParquet.writeZOrdered(mk(Seq(
      (1L, 10.0, 10.0, 1.0), (2L, 510.0, 10.0, 2.0))), dir, 500.0, 2)
    GeoParquet.writeManifest(spark, dir)
    MaterializedAgg.refresh(spark, dir, st, 500.0)
    GeoParquet.appendCurve(mk(Seq(
      (3L, 20.0, 20.0, 3.0), (4L, 20.0, 520.0, 4.0))), dir, 500.0)
    val oldest = GeoParquet.snapshots(spark, dir)
      .agg(min("epoch")).head().getLong(0)
    assert(oldest <= GeoParquet.readEpoch(spark, dir) - 1) // incremental reachable
    MaterializedAgg.refresh(spark, dir, st, 500.0)
    assert(stateSet(st) == scratchSet(dir))
    assert(MaterializedAgg.read(spark, st).agg(sum("n")).head().getLong(0) == 4L)
  }

  test("incremental path is exercised: post-refresh appends merge without rescanning") {
    val dir = java.nio.file.Files.createTempDirectory("incragg2_l").toString
    val st = java.nio.file.Files.createTempDirectory("incragg2_s").toString
    GeoParquet.write(mk(Seq((1L, 10.0, 10.0, 1.0))), dir, 500.0)
    GeoParquet.writeManifest(spark, dir)
    MaterializedAgg.refresh(spark, dir, st, 500.0)
    GeoParquet.appendWithManifest(mk(Seq((2L, 15.0, 15.0, 2.0))), dir, 500.0)
    // the merge path is reachable iff history covers the stored epoch
    val oldest = GeoParquet.snapshots(spark, dir)
      .agg(min("epoch")).head().getLong(0)
    val stored = GeoParquet.readEpoch(spark, dir) - 1
    assert(oldest <= stored, "changelog must reach the stored state's epoch")
    MaterializedAgg.refresh(spark, dir, st, 500.0)
    assert(stateSet(st) ==
      Set((0L, 0L, 2L, 3L, 1.0, 2.0))) // one bin: n=2, sum_id=3, z∈[1,2]
  }
}
