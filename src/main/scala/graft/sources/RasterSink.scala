package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raster persistence — the mapData.to_geotif analog
  * (mapData.py:125-161) re-expressed for a distributed store: the
  * grid is written as parquet *raster tiles* partitioned by an
  * `E*_N*` tile key (the same layout ATL06_tiles and write_xovers
  * use), with the georeferencing that a GeoTIFF header would carry —
  * CRS (EPSG code), cell size, origin — in a JSON sidecar.  Readers
  * prune to a tile at planning time; a single-node GDAL edge job can
  * format-convert one tile at a time without ever holding the raster
  * in memory.
  */
object RasterSink {

  /** The GeoTIFF-header payload: CRS + geotransform. */
  final case class RasterMeta(epsg: Int, delta: Double, tileSize: Double)

  private def metaPath(path: String) = java.nio.file.Paths.get(path, "raster.json")

  def write(grid: DataFrame, path: String, meta: RasterMeta): Unit = {
    grid
      .withColumn("tile_e",
        (floor(col("gx") / meta.tileSize) * meta.tileSize.toLong).cast("long"))
      .withColumn("tile_n",
        (floor(col("gy") / meta.tileSize) * meta.tileSize.toLong).cast("long"))
      .repartition(col("tile_e"), col("tile_n"))
      .sortWithinPartitions("gx", "gy")
      .write.mode("overwrite")
      .partitionBy("tile_e", "tile_n")
      .parquet(s"$path/tiles")
    java.nio.file.Files.writeString(metaPath(path),
      s"""{"epsg":${meta.epsg},"delta":${meta.delta},"tile_size":${meta.tileSize}}""")
  }

  def readMeta(path: String): RasterMeta = {
    val s = java.nio.file.Files.readString(metaPath(path))
    def field(k: String): Double =
      s.split(s""""$k":""")(1).takeWhile(c => c.isDigit || c == '.' || c == '-').toDouble
    RasterMeta(field("epsg").toInt, field("delta"), field("tile_size"))
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/tiles")

  /** One raster tile, pruned at planning time via the partition keys. */
  def readTile(spark: SparkSession, path: String, e: Long, n: Long): DataFrame =
    read(spark, path).filter(col("tile_e") === e && col("tile_n") === n)
}
