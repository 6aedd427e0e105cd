package graft

import org.apache.spark.sql.functions._

import graft.sources.{Atl11H5, RasterH5, SourceRegistry}

/** HDF5 raster tiles ([[RasterH5]] = mapData.from_h5, mapData.py:
  * 96-123) and ATL11 granules ([[Atl11H5]], geo_index.py:245-255).
  */
class RasterH5Spec extends SparkSpec {
  import spark.implicits._

  test("grid → .h5 tiles → grid is exact; bounds select the contiguous slab") {
    val grid = (0 until 400).map { i =>
      ((i % 20) * 100L - 1000L, (i / 20) * 100L - 1000L, i * 0.25 - 7.5)
    }.toDF("gx", "gy", "gz")
    val dir = java.nio.file.Files.createTempDirectory("rh5").toString
    RasterH5.writeTiles(grid, dir, tileSize = 1000.0)
    val back = RasterH5.readGrid(spark, dir)
    assert(back.exceptAll(grid).count() == 0 && grid.exceptAll(back).count() == 0)
    // bounds follow the reference's rows[0]:rows[-1]+1 slab selection
    val win = RasterH5.read(spark, dir,
      bounds = Some(((-500.0, 300.0), (0.0, 400.0))))
    val got = win.select("x", "y").as[(Double, Double)].collect().toSet
    assert(got.nonEmpty)
    assert(got.forall { case (x, y) => x >= -500 && x <= 300 && y >= 0 && y <= 400 })
    // every in-bounds grid node is present (slab is contiguous and full)
    val expect = (for (gx <- -500L to 300L by 100L; gy <- 0L to 400L by 100L)
      yield (gx.toDouble, gy.toDouble)).toSet
    assert(got == expect)
  }

  test("ATL11 granules: write → read exact; registry kind indexes them") {
    val base = java.nio.file.Files.createTempDirectory("atl11").toString
    val gran = (0 until 300).map { i =>
      (i % 2, i.toLong, -72.0 - (i % 40) * 0.01, (i % 80) * 0.25,
        i * 0.5 + 10.0, i * 2.0)
    }.toDF("gran", "id", "latitude", "longitude", "h_corr", "delta_time")
    Atl11H5.writeGranules(gran, s"$base/granules")
    val back = Atl11H5.read(spark, s"$base/granules")
    assert(back.count() == 300L)
    // beam-pair structure: pt{1..3} split by ref_pt mod 3
    assert(back.filter(col("beam_pair") === (col("ref_pt") % 3) + 1).count() == 300L)
    assert(back.filter(col("ref_pt") === 123L).select("h_corr")
      .head().getDouble(0) == 71.5)
    val pts = SourceRegistry.readAs(spark, "atl11_h5", s"$base/granules")
    assert(pts.count() == 300L && pts.select("id").distinct().count() == 300L)
    val idx = SourceRegistry.forFile(spark, "atl11_h5", s"$base/granules", 500.0)
    assert(idx.agg(sum("n_points")).head().getLong(0) == 300L)
  }
}
