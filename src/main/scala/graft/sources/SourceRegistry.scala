package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{GeoOps, Projections}

/** File-type dispatch registry — the Spark face of the reference's
  * `geo_index.for_file` / `index_list_for_files`
  * (geo_index.py:231-289, geo_index.py:679-698): ONE entry point that
  * maps a declared source kind to its reader, runs the per-source
  * index build, and merges the partial indexes with the associative
  * `from_list` law.
  *
  * The reference dispatches on a file_type string to per-format
  * readers (ATL06/ATL11 HDF5 groups, ATM Qfit records, DEMs,
  * already-built h5_geoindex files) and then either `from_xy` /
  * `from_latlon` (point-bearing kinds) or direct bin adoption
  * (index-bearing kinds).  Here the same split: point kinds land in
  * the canonical `(id, x, y, z, t)` schema — lat/lon-bearing formats
  * are projected at read with the registry's CRS, exactly the
  * reference's `SRS_proj4` index attribute — and the `geoindex` kind
  * adopts a saved index's bins WITHOUT a point scan.  Building an
  * index over a 1000-file mixed archive is then `files.map(forFile)`
  * (embarrassingly parallel, each file's rollup is its own pruned
  * scan) + one index-sized merge shuffle (bins, not points).
  */
object SourceRegistry {

  type Reader = (SparkSession, String) => DataFrame

  /** Kinds that land directly in the canonical x/y point schema. */
  private val xyReaders: Map[String, Reader] = Map(
    "csv" -> (PointSources.readCsv _),
    "json" -> (PointSources.readJson _),
    "parquet" -> (PointSources.readParquet _),
    "orc" -> (PointSources.readOrc _))

  /** Kinds whose records carry lat/lon, projected at read
    * (the reference's `from_latlon` arm, geo_index.py:262-268; the
    * `atl06_h5` kind is the reference's PRIMARY format — real `.h5`
    * beam-group granules decoded by the self-contained codec,
    * geo_index.py:240-249 ATL06 arm).
    */
  private val latlonReaders: Map[String, Reader] = Map(
    "qfit" -> (QfitSource.read _),
    "qfit_waveform" -> (QfitSource.readWaveform _),
    "qfit_h5" -> (QfitH5.readForRegistry _),
    "qfit_waveform_h5" -> (QfitH5.readWaveformForRegistry _),
    "atl06_h5" -> (Atl06H5.readForRegistry _),
    "atl11_h5" -> (Atl11H5.readForRegistry _))

  /** Index-bearing kind: a saved partial index adopted bin-for-bin,
    * no point scan (the reference's `h5_geoindex` arm,
    * geo_index.py:275-289).  A `.h5` path opens the reference's
    * actual index-file layout ([[GeoIndexH5.adopt]]); anything else
    * is a graft-written parquet partial index.
    */
  val IndexKind = "geoindex"

  /** Raster-bearing kind: a directory of real GeoTIFF granules read
    * as points, cell-center = point (the reference's DEM arm,
    * geo_index.py:269-274 via read_DEM).  Each granule decodes on an
    * executor ([[GeoTiff.read]]); the synthetic id is the cell's
    * (gx, gy) packed into one long — deterministic, unique per cell
    * for |coord| < 2²⁰, which is what the bin rollup's id_min/id_max
    * stats need.
    */
  val DemKind = "geotiff_dem"

  def kinds: Seq[String] =
    (xyReaders.keys ++ latlonReaders.keys ++
      Seq(IndexKind, DemKind, "indexed_h5",
        "indexed_h5_from_matlab")).toSeq.sorted

  /** The subset of [[kinds]] that [[readAs]] can open as POINT data.
    * The remainder (`geoindex`, `indexed_h5`, `indexed_h5_from_matlab`)
    * are index/adoption kinds reachable only through [[forFile]] /
    * [[indexListForFiles]].
    */
  def pointKinds: Seq[String] =
    (xyReaders.keys ++ latlonReaders.keys ++ Seq(DemKind)).toSeq.sorted

  /** Read any registered POINT kind into the canonical
    * `(id, x, y, z, t)` schema.  For lat/lon formats `id` is the
    * record index within its file (the reference's per-file offsets;
    * cross-file uniqueness is not promised, matching the reference's
    * per-file run lists) and `t` is the record's own time axis in ms.
    */
  def readAs(spark: SparkSession, kind: String, path: String,
             epsg: Int = 3031): DataFrame = kind match {
    case k if xyReaders.contains(k) => xyReaders(k)(spark, path)
    case DemKind =>
      GeoTiff.readGrid(spark, path).select(
        ((col("gx") + 1048576L) * 2097152L + (col("gy") + 1048576L)).as("id"),
        col("gx").cast("double").as("x"), col("gy").cast("double").as("y"),
        col("gz").as("z"), lit(null).cast("long").as("t"))
    case k if latlonReaders.contains(k) =>
      val d = latlonReaders(k)(spark, path)
      val (px, py) =
        Projections.forward(col("latitude"), col("longitude"), epsg)
      val tCol =
        if (d.columns.contains("rel_time_s")) col("rel_time_s")
        else col("seconds_of_day")
      d.select(col("rec_idx").as("id"), px.as("x"), py.as("y"),
        col("elevation").as("z"),
        (tCol * 1000).cast("long").as("t"))
    case k @ (IndexKind | "indexed_h5" | "indexed_h5_from_matlab") =>
      throw new IllegalArgumentException(
        s"'$k' is an index/adoption kind, not a point source — use " +
          s"forFile/indexListForFiles (point kinds: ${pointKinds.mkString(", ")})")
    case other => throw new IllegalArgumentException(
      s"unregistered source kind '$other' (known: ${kinds.mkString(", ")})")
  }

  /** Per-source bin rollup — the registry's `from_xy`
    * (geo_index.py:71-100), schema-identical to the partial indexes
    * [[GeoOps.mergeIndexes]] takes.
    */
  def indexOf(points: DataFrame, delta: Double): DataFrame =
    points
      .select(GeoOps.binOf(col("x"), delta).as("bin_x"),
        GeoOps.binOf(col("y"), delta).as("bin_y"), col("id"))
      .groupBy("bin_x", "bin_y")
      .agg(count("*").as("n_points"),
        min("id").as("id_min"), max("id").as("id_max"))

  /** `for_file` (geo_index.py:231): dispatch one file to its reader
    * and build its partial index; the `geoindex` kind adopts a saved
    * index directly.
    */
  def forFile(spark: SparkSession, kind: String, path: String,
              delta: Double, epsg: Int = 3031): DataFrame = kind match {
    case IndexKind if path.endsWith(".h5") =>
      GeoIndexH5.adopt(spark, path)
        .select(col("bin_x"), col("bin_y"), col("n_points"),
          col("id_min"), col("id_max"))
    case "indexed_h5" =>
      // self-indexed data files (geo_index.py:289-315) — centers
      // (and offsets when the file carries them) adopted directly;
      // bins without offsets contribute null n_points, which the
      // merge's sum skips (the reference's fake_offset_val=-1)
      IndexedH5.adopt(spark, path)
    case "indexed_h5_from_matlab" =>
      // matlab-written self-indexed files (geo_index.py:318-326) —
      // centers only, offsets never trusted (fake_offset_val=-1)
      IndexedH5.adoptMatlab(spark, path)
    case IndexKind =>
      spark.read.parquet(path)
        .select(col("bin_x"), col("bin_y"), col("n_points"),
          col("id_min"), col("id_max"))
    case k => indexOf(readAs(spark, k, path, epsg), delta)
  }

  /** `index_list_for_files` (geo_index.py:679): per-file partial
    * indexes merged under the `from_list` law — one index-sized
    * shuffle regardless of how many point files feed it.
    */
  def indexListForFiles(spark: SparkSession,
                        files: Seq[(String, String)], delta: Double,
                        epsg: Int = 3031): DataFrame = {
    require(files.nonEmpty, "index_list_for_files of an empty list")
    GeoOps.mergeIndexes(
      files.map { case (k, p) => forFile(spark, k, p, delta, epsg) })
  }
}
