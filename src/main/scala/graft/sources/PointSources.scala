package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Point-cloud source readers — the Spark face of the reference's
  * format zoo (ATL06_data.py, qfit_data.py, read_DEM.py readers).
  *
  * The reference hand-rolls one reader per format (HDF5 groups per
  * beam, Qfit records, DEM rasters); here every source lands in the
  * canonical point schema `(id, x, y, z, t, ...)` via spark.read with
  * an explicit schema — schema-on-read, predicate pushdown and
  * parallel split listing for free.
  */
object PointSources {

  /** Canonical point schema (point_data.py's default field set). */
  val pointSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("x", DoubleType, nullable = true),
    StructField("y", DoubleType, nullable = true),
    StructField("z", DoubleType, nullable = true),
    StructField("t", LongType, nullable = true)))

  /** CSV point source (Qfit-style flat records). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(pointSchema).option("header", "true").csv(path)

  /** JSON-lines point source. */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(pointSchema).json(path)

  /** Parquet point source (the native format). */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(
      col("id").cast("long"), col("x").cast("double"), col("y").cast("double"),
      col("z").cast("double"), col("t").cast("long"))

  /** ORC point source — same canonical schema; ORC files carry their
    * own min/max stripe statistics, so the sargable box filters push
    * down exactly as on parquet.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path).select(
      col("id").cast("long"), col("x").cast("double"), col("y").cast("double"),
      col("z").cast("double"), col("t").cast("long"))

  /** A DEM-style raster as a grid table `(gx, gy, gz)` from any point
    * source, block-averaged at δ (read_DEM.py asPoints=True analog).
    */
  def rasterize(points: DataFrame, delta: Double): DataFrame =
    points
      .groupBy((floor(col("x") / delta) * delta.toLong).cast("long").as("gx"),
               (floor(col("y") / delta) * delta.toLong).cast("long").as("gy"))
      .agg(avg("z").as("gz"), count("*").as("n"))
}
