package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raster grids in HDF5 — the reference's `mapData.from_h5`
  * (mapData.py:96-123): a group holding 1-D axis datasets `x`
  * (columns) and `y` (rows) plus a 2-D `z` of shape (y.size,
  * x.size); `bounds` selects the contiguous row/column slab whose
  * axis values fall inside, exactly the reference's
  * `rows[0]:rows[-1]+1` slicing.
  *
  * Scale shape mirrors [[GeoTiff]]: one `.h5` is one raster TILE
  * (the same E*_N* tiling), encoded on executors via
  * `mapPartitions`, decoded via binaryFile — the whole raster never
  * exists in one piece anywhere.
  */
object RasterH5 {

  final case class GridCell(file: String, x: Double, y: Double, v: Double)

  /** One granule: `/dem/x`, `/dem/y` (ascending), `/dem/z` row-major
    * (y.size × x.size) float64 — lossless for our grid tables.
    */
  def granuleBytes(cells: Seq[(Double, Double, Double)], group: String = "dem"):
      Array[Byte] = {
    val xs = cells.map(_._1).distinct.sorted.toArray
    val ys = cells.map(_._2).distinct.sorted.toArray
    val xi = xs.zipWithIndex.toMap
    val yi = ys.zipWithIndex.toMap
    val z = Array.fill(ys.length * xs.length)(Double.NaN)
    cells.foreach { case (x, y, v) => z(yi(y) * xs.length + xi(x)) = v }
    val w = new Hdf5.Writer
    w.doubles(s"/$group/x", xs)
    w.doubles(s"/$group/y", ys)
    w.doubles(s"/$group/z", z, dims = Seq(ys.length.toLong, xs.length.toLong))
    w.attrS(s"/$group/z", "units", "m")
    w.toBytes
  }

  /** Write a distributed grid `(gx, gy, gz)` as one `.h5` granule per
    * `tileSize` tile, encoded on executors, Hadoop-FS path-aware.
    */
  def writeTiles(grid: DataFrame, dir: String, tileSize: Double,
                 group: String = "dem"): Unit = {
    val spark = grid.sparkSession
    import spark.implicits._
    val hconf = spark.sparkContext.broadcast(
      new SerHadoopConf(spark.sparkContext.hadoopConfiguration))
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(dirPath)
    grid
      .select(col("gx").cast("double"), col("gy").cast("double"),
        col("gz").cast("double"))
      .withColumn("tile_e", (floor(col("gx") / tileSize) * tileSize).cast("long"))
      .withColumn("tile_n", (floor(col("gy") / tileSize) * tileSize).cast("long"))
      .repartition(col("tile_e"), col("tile_n"))
      .sortWithinPartitions("tile_e", "tile_n")
      .as[(Double, Double, Double, Long, Long)]
      .mapPartitions { it =>
        GranuleGroups.byKey(it)(t => (t._4, t._5)).map { case ((e, n), cells) =>
          val bytes = granuleBytes(cells.map(c => (c._1, c._2, c._3)), group)
          val p = new org.apache.hadoop.fs.Path(s"$dir/E${e}_N$n.h5")
          val fs = p.getFileSystem(hconf.value.conf)
          val os = fs.create(p, true)
          try os.write(bytes) finally os.close()
          s"E${e}_N$n"
        }
      }
      .write.format("noop").mode("overwrite").save()
  }

  /** `from_h5` over a granule directory: every (x, y, z) cell, with
    * the reference's contiguous-slab bounds selection.  NaN cells
    * (unfilled grid nodes) are dropped, like from_geotif's
    * nodata→NaN masking.
    */
  def read(spark: SparkSession, dir: String, group: String = "dem",
           bounds: Option[((Double, Double), (Double, Double))] = None):
      DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", "*.h5").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val r = new Hdf5.Reader(bytes)
        val xs = r.readDoubles(s"/$group/x")
        val ys = r.readDoubles(s"/$group/y")
        val z = r.readDoubles(s"/$group/z")
        val cols = bounds match {
          case Some(((x0, x1), _)) => xs.indices.filter(i => xs(i) >= x0 && xs(i) <= x1)
          case None => xs.indices
        }
        val rows = bounds match {
          case Some((_, (y0, y1))) => ys.indices.filter(i => ys(i) >= y0 && ys(i) <= y1)
          case None => ys.indices
        }
        // contiguous slab, as mapData.py:114-117
        val (c0, c1) = if (cols.isEmpty) (0, -1) else (cols.head, cols.last)
        val (r0, r1) = if (rows.isEmpty) (0, -1) else (rows.head, rows.last)
        for {
          ri <- Iterator.range(r0, r1 + 1)
          ci <- Iterator.range(c0, c1 + 1)
          v = z(ri * xs.length + ci)
          if !v.isNaN
        } yield GridCell(path, xs(ci), ys(ri), v)
      }
      .toDF()
  }

  /** Granule directory back as the engine's grid table (gx, gy, gz). */
  def readGrid(spark: SparkSession, dir: String, group: String = "dem"): DataFrame =
    read(spark, dir, group)
      .select(round(col("x")).cast("long").as("gx"),
        round(col("y")).cast("long").as("gy"),
        col("v").as("gz"))
}
