package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sources.{Atl06H5, GeoIndexH5}

/** HDF5-format closure queries: the reference's primary container
  * (every reader in PointDatabase opens `.h5` through h5py) pushed
  * through graft's self-contained codec end-to-end, with the parquet
  * tables as the DuckDB-checkable ground truth — the `q_geotiff_dem`
  * pattern: a hash match proves the container round-trip is
  * BIT-LOSSLESS, not merely plausible.
  */
object H5Ops {

  private val P = Tables.eventsPointsSql

  /** 66b. ATL06 granule cycle (ATL06_data.py:92-171): the events
    * points become four ATL06-shaped granules — six
    * `gt{1..3}{l,r}/land_ice_segments` beam groups of parallel
    * chunked/compressed arrays, written on executors — then decode
    * back through the binaryFile source.  The oracle recomputes every
    * column straight from parquet, so the hash match pins the whole
    * codec path (superblock, symbol tables, chunk B-trees, deflate/
    * shuffle/fletcher32, float64 payloads) bit-for-bit.
    */
  def atl06Roundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("atl06h5").toString
    val gran = Tables.eventsPoints(s, dir).select(
      (col("id") % 4).as("gran"), col("id"),
      (col("y") / 100000.0).as("latitude"),
      (col("x") / 100000.0).as("longitude"),
      col("z").as("h_li"),
      (col("t") / 1000.0).as("delta_time"))
    Atl06H5.writeGranules(gran, out)
    Atl06H5.read(s, out).select(
      col("segment_id").as("id"),
      col("beam_pair").cast("long").as("beam_pair"),
      col("lr").cast("long").as("lr"),
      col("latitude"), col("longitude"), col("h_li"), col("delta_time"))
      .orderBy("id")
  }

  val atl06RoundtripSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, CAST((id % 6) // 2 + 1 AS BIGINT) AS beam_pair,
       |       CAST(id % 2 AS BIGINT) AS lr,
       |       y/100000.0 AS latitude, x/100000.0 AS longitude,
       |       z AS h_li, t/1000.0 AS delta_time
       |FROM pts ORDER BY id""".stripMargin

  /** 66c. `h5_geoindex` cycle (geo_index.py:205-229 `to_file` →
    * :275-289 `for_file('h5_geoindex')`): per-bin offset runs (the
    * gaps-and-islands form of the reference's coalesced offset
    * lists) are saved in the reference's exact index-file layout —
    * `index` group, per-bin subgroups with `file_num`/`offset_start`/
    * `offset_end` — and adopted back WITHOUT a point scan.  The
    * oracle rebuilds the same run statistics from raw parquet, so a
    * hash match proves adoption is bin-for-bin exact.
    */
  def h5IndexRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.eventsPoints(s, dir).select(
      GeoOps.binOf(col("x"), 400).as("bin_x"),
      GeoOps.binOf(col("y"), 400).as("bin_y"), col("id"))
    val w = Window.partitionBy("bin_x", "bin_y").orderBy("id")
    val runs = p.withColumn("island", col("id") - row_number().over(w))
      .groupBy("bin_x", "bin_y", "island")
      .agg(min("id").as("run_start"), max("id").as("run_end"))
      .drop("island")
      .withColumn("file_num", lit(0L))
    val path = java.nio.file.Files.createTempDirectory("gih5").toString + "/index.h5"
    GeoIndexH5.write(runs, 400.0,
      "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +k=1 +x_0=0 +y_0=0 +datum=WGS84 +units=m +no_defs",
      "/data", Seq(("events.parquet", "ATL06")), path)
    GeoIndexH5.readRuns(s, path)
      .groupBy("bin_x", "bin_y")
      .agg(count("*").as("n_runs"),
        sum(col("offset_end") - col("offset_start") + 1).cast("long").as("n_points"),
        min("offset_start").as("id_min"), max("offset_end").as("id_max"))
      .orderBy("bin_x", "bin_y")
  }

  val h5IndexRoundtripSql: String =
    s"""WITH pts AS ($P),
       |f AS (SELECT CAST(round(x/400.0)*400 AS BIGINT) AS bin_x,
       |             CAST(round(y/400.0)*400 AS BIGINT) AS bin_y, id
       |      FROM pts),
       |i AS (SELECT *, id - row_number() OVER (PARTITION BY bin_x, bin_y ORDER BY id) AS island
       |      FROM f),
       |r AS (SELECT bin_x, bin_y, island, min(id) AS s, max(id) AS e
       |      FROM i GROUP BY 1,2,3)
       |SELECT bin_x, bin_y, count(*) AS n_runs,
       |       CAST(sum(e - s + 1) AS BIGINT) AS n_points,
       |       min(s) AS id_min, max(e) AS id_max
       |FROM r GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  /** 66f. `mapData.from_h5` raster cycle (mapData.py:96-123): the
    * δ=100 DEM grid lands as HDF5 raster tiles (1-D x/y axes + 2-D z
    * per granule, executor-encoded), reads back through the
    * contiguous-slab path, and feeds the standard bilinear probes.
    * Same oracle as the plain-parquet and GeoTIFF DEM paths — a hash
    * match proves the `.h5` raster container is bit-lossless too.
    */
  def h5Dem(s: SparkSession, dir: String): DataFrame = {
    val grid = DateOps.demGrid(s, dir)
    val out = java.nio.file.Files.createTempDirectory("h5dem").toString
    graft.sources.RasterH5.writeTiles(grid, out, tileSize = 1600.0)
    DateOps.bilinearOnGrid(graft.sources.RasterH5.readGrid(s, out), s, dir)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_atl06_h5" -> (atl06Roundtrip _),
    "q_h5_index" -> (h5IndexRoundtrip _),
    "q_h5_dem" -> (h5Dem _))

  val oracles: Map[String, String] = Map(
    "q_atl06_h5" -> atl06RoundtripSql,
    "q_h5_index" -> h5IndexRoundtripSql,
    "q_h5_dem" -> DateOps.gridInterpSql)
}
