package graft

import org.apache.spark.sql.functions._

import graft.sources.GeoParquet

/** [[GeoParquet.staleTiles]] — the reference's `make_queue`
  * (ATL06_tiles.py:162-210) as metadata: which tiles need re-running
  * after new commits, from the changelog prune, with the
  * `dilate_bins` 8-neighborhood.
  */
class StaleTilesSpec extends SparkSpec {
  import spark.implicits._

  private def batch(ids: Range, x0: Double, y0: Double) =
    ids.map(i => (i.toLong, x0 + (i % 10) * 2.0, y0 + (i % 7) * 2.0, i * 1.0))
      .toDF("id", "x", "y", "z")

  test("staleTiles: changed-bin → tile rollup with dilation, empty when caught up") {
    val dir = java.nio.file.Files.createTempDirectory("staletiles").toString
    GeoParquet.write(batch(0 until 200, 10.0, 10.0), dir, 250.0) // epoch 0
    GeoParquet.writeManifest(spark, dir)
    val e0 = GeoParquet.readEpoch(spark, dir)
    // one localized append: every new point lands in tile (500, 500)
    GeoParquet.appendWithManifest(
      batch(1000 until 1040, 510.0, 510.0), dir, 250.0) // epoch e0+1
    val stale = GeoParquet.staleTiles(spark, dir, e0, tileSize = 500.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the touched tile plus its 8 neighbors, nothing else
    val want = (for (de <- -1 to 1; dn <- -1 to 1)
      yield (500L + de * 500L, 500L + dn * 500L)).toSet
    assert(stale.keySet == want,
      s"dilated stale set diverged: ${stale.keySet} vs $want")
    assert(stale((500L, 500L)) == 40L, s"changed-row count: $stale")
    assert(want.filterNot(_ == (500L, 500L))
      .forall(t => stale(t) == 0L), "neighbor tiles must carry n_new = 0")
    // undilated: exactly the touched tile
    val tight = GeoParquet.staleTiles(spark, dir, e0, 500.0, dilate = false)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toSeq
    assert(tight == Seq(((500L, 500L), 40L)), s"undilated: $tight")
    // caught-up consumer: nothing stale
    val e1 = GeoParquet.readEpoch(spark, dir)
    assert(GeoParquet.staleTiles(spark, dir, e1, 500.0).isEmpty,
      "a caught-up sinceEpoch must report zero stale tiles")
    // a second append in a DIFFERENT tile accumulates, from the old cursor
    GeoParquet.appendWithManifest(
      batch(2000 until 2010, -990.0, -990.0), dir, 250.0)
    val both = GeoParquet.staleTiles(spark, dir, e0, 500.0, dilate = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(both == Map((500L, 500L) -> 40L, (-1000L, -1000L) -> 10L),
      s"two-commit inventory diverged: $both")
  }
}
