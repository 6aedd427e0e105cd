package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Raster products over grid tables — the write-back half of the
  * reference's mapData (mapData.py:125-196: `normalize`, `toRGB`,
  * `to_geotif`).  A raster here is a grid DataFrame `(gx, gy, gz)`
  * (see PointSources.rasterize); the full product pipeline —
  * block-average, normalize to [0,1], quantize to 8-bit gray — is
  * pure column math.  Persistence is either CRS-tagged tiled parquet
  * ([[graft.sources.RasterSink]]) or REAL GeoTIFF granules
  * ([[graft.sources.GeoTiff]] — self-contained TIFF 6.0 codec, no
  * GDAL needed); [[geotiffDem]] proves the `.tif` round-trip is
  * lossless by pushing the DEM-interp oracle query through it.
  */
object RasterOps {

  /** mapData.normalize + toRGB + add_alpha_band as one plan: δ=100
    * block-average grid from the point view (exact integer-cents
    * means), global min/max normalization, 8-bit gray quantization,
    * and the nodata→alpha mask (mapData.py:160-178: alpha drops to 0
    * where the band equals the nodata value — here the grid's global
    * minimum stands in for the nodata sentinel, NaN-or-equal like the
    * reference's `~isfinite | ==nodata`).  min/max ride a broadcast
    * cross join of the 1-row aggregate — the grid scan runs twice
    * (agg + join), which at 100 TB is still two cheap passes over the
    * *grid* (≪ points), never the point data.
    */
  def rasterRgb(s: SparkSession, dir: String): DataFrame = {
    val d = 100.0
    val g = Tables.eventsPoints(s, dir)
      .groupBy((floor(col("x") / d) * d.toLong).cast("long").as("gx"),
               (floor(col("y") / d) * d.toLong).cast("long").as("gy"))
      .agg((sum(round(col("z") * 100).cast("long")) / 100.0 / count("*")).as("gz"))
    val mm = g.agg(min("gz").as("zmin"), max("gz").as("zmax"))
    g.crossJoin(broadcast(mm))
      .withColumn("norm",
        when(col("zmax") =!= col("zmin"),
          (col("gz") - col("zmin")) / (col("zmax") - col("zmin"))).otherwise(0.0))
      .withColumn("gray", least(floor(col("norm") * 255.0), lit(255L)))
      .withColumn("alpha",
        when(isnan(col("gz")) || col("gz") === col("zmin"), 0L).otherwise(1L))
      .select("gx", "gy", "gz", "norm", "gray", "alpha")
      .orderBy("gx", "gy")
  }

  val rasterRgbSql: String =
    s"""WITH pts AS (${Tables.eventsPointsSql}),
       |g AS (SELECT CAST(floor(x/100.0)*100 AS BIGINT) AS gx,
       |             CAST(floor(y/100.0)*100 AS BIGINT) AS gy,
       |             sum(CAST(round(z*100) AS BIGINT))/100.0/count(*) AS gz
       |      FROM pts GROUP BY 1,2),
       |mm AS (SELECT min(gz) AS zmin, max(gz) AS zmax FROM g),
       |n AS (SELECT gx, gy, gz, zmin,
       |        CASE WHEN zmax <> zmin THEN (gz - zmin)/(zmax - zmin)
       |             ELSE 0.0 END AS norm
       |      FROM g, mm)
       |SELECT gx, gy, gz, norm,
       |  least(CAST(floor(norm*255.0) AS BIGINT), 255) AS gray,
       |  CASE WHEN isnan(gz) OR gz = zmin THEN 0 ELSE 1 END::BIGINT AS alpha
       |FROM n ORDER BY gx, gy""".stripMargin

  /** 23g. `to_geotif` → `from_geotif` → interp, end-to-end through
    * REAL `.tif` bytes (mapData.py:125/39): the δ=100 DEM grid is
    * written as float64 GeoTIFF tiles (encoded on executors), read
    * back through the binaryFile source, and bilinearly sampled at
    * the standard probe points.  The oracle is the plain parquet-grid
    * interp SQL — a hash match proves the GeoTIFF round-trip is
    * BIT-LOSSLESS, not merely approximately right.
    */
  def geotiffDem(s: SparkSession, dir: String): DataFrame = {
    val grid = DateOps.demGrid(s, dir)
    val out = java.nio.file.Files.createTempDirectory("geotifdem").toString
    graft.sources.GeoTiff.writeTiles(grid, out, epsg = 3031,
      delta = 100.0, tileSize = 1600.0)
    DateOps.bilinearOnGrid(graft.sources.GeoTiff.readGrid(s, out), s, dir)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_raster_rgb" -> (rasterRgb _),
    "q_geotiff_dem" -> (geotiffDem _))

  val oracles: Map[String, String] = Map(
    "q_raster_rgb" -> rasterRgbSql,
    "q_geotiff_dem" -> DateOps.gridInterpSql)
}
