package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GeoOps

/** User-facing facade mirroring the reference's point_data /
  * geo_index API (point_data.py, geo_index.py) over a DataFrame with
  * at least (x, y) columns — so a reference user can port call-for-
  * call while everything executes as Catalyst plans:
  *
  * {{{
  * val pf = PointFrame(df)
  * pf.queryBox((-200, 400), (-300, 300))      // geo_index.query_xy_box
  *   .blockmedian(50.0)                       // point_data.blockmedian
  * pf.geoIndex(100.0)                         // geo_index.from_xy
  * pf.toGeoParquet("path", 100.0)             // geo_index.to_file
  * }}}
  */
final case class PointFrame(df: DataFrame, delta: Double = 100.0) {

  private def binX: Column = GeoOps.binOf(col("x"), delta)
  private def binY: Column = GeoOps.binOf(col("y"), delta)

  /** point_data.subset / index — predicate subset. */
  def where(cond: Column): PointFrame = copy(df = df.filter(cond))

  /** geo_index.from_xy: the per-bin inventory (the index itself). */
  def geoIndex(d: Double = delta): PointFrame = copy(
    df = df.groupBy(GeoOps.binOf(col("x"), d).as("bin_x"),
                    GeoOps.binOf(col("y"), d).as("bin_y"))
      .agg(count("*").as("n_points")), delta = d)

  /** geo_index.query_xy_box: bin-granular box query. */
  def queryBox(xr: (Long, Long), yr: (Long, Long)): PointFrame =
    copy(df = df.filter(binX.between(xr._1, xr._2) && binY.between(yr._1, yr._2)))

  /** geo_index.keys_from_xy (geo_index.py:489-492): snap raw probe
    * coordinates to the δ lattice and return the `"x_y"` bin-key
    * strings that are actually POPULATED in this frame — the
    * reference's accessor for turning arbitrary xy into index keys
    * before a query.  The probe list is driver-sized (a handful of
    * coordinates); the populated-key check is one distinct-bin
    * semi-join against the frame's inventory, never a point scan
    * result at the driver.
    */
  def keysFromXY(xs: Seq[Double], ys: Seq[Double]): Seq[String] = {
    require(xs.length == ys.length,
      "keysFromXY needs parallel x/y probe sequences")
    val spark = df.sparkSession
    import spark.implicits._
    val probes = xs.zip(ys).toDF("px", "py")
      .select(GeoOps.binOf(col("px"), delta).as("bin_x"),
        GeoOps.binOf(col("py"), delta).as("bin_y"))
      .distinct()
    probes.join(
        df.select(binX.as("bin_x"), binY.as("bin_y")).distinct(),
        Seq("bin_x", "bin_y"), "leftsemi")
      .orderBy("bin_x", "bin_y")
      .collect()
      .map(r => s"${r.getLong(0)}_${r.getLong(1)}")
      .toSeq
  }

  /** geo_index.query_xy with pad: points in the given bins ±pad. */
  def queryBins(bins: Seq[(Long, Long)], pad: Int = 0): PointFrame = {
    val d = delta.toLong
    val keys = (for {
      (bx, by) <- bins; ox <- -pad to pad; oy <- -pad to pad
    } yield (bx + ox * d, by + oy * d)).distinct
    copy(df = df.filter(
      keys.map { case (a, b) => binX === a && binY === b }.reduce(_ || _)))
  }

  /** geo_index.intersect: bins common to this and another frame,
    * optionally dilating this frame's bins by ±pad bins first
    * (geo_index.py:351-361's pad argument, via the pad_bins
    * machinery).  The dilation cross-joins the tiny distinct-bin
    * inventory against a broadcast (2·pad+1)² offset table — never
    * the point data.
    */
  def intersectBins(other: PointFrame, pad: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val a0 = df.select(binX.as("bin_x"), binY.as("bin_y")).distinct()
    val a =
      if (pad == 0) a0
      else {
        val d = delta.toLong
        val off = spark.range(-pad, pad + 1).select((col("id") * d).as("o"))
        a0.crossJoin(broadcast(off.select(col("o").as("ox"))))
          .crossJoin(broadcast(off.select(col("o").as("oy"))))
          .select((col("bin_x") + col("ox")).as("bin_x"),
                  (col("bin_y") + col("oy")).as("bin_y"))
          .distinct()
      }
    val b = other.df.select(
      GeoOps.binOf(col("x"), delta).as("bin_x"),
      GeoOps.binOf(col("y"), delta).as("bin_y")).distinct()
    a.join(b, Seq("bin_x", "bin_y"))
  }

  /** pt_blockmedian: the reference's exact median-point selection. */
  def blockmedian(scale: Double): DataFrame = {
    val c = df
      .withColumn("cx", GeoOps.cellOf(col("x"), scale))
      .withColumn("cy", GeoOps.cellOf(col("y"), scale))
    val w = Window.partitionBy("cx", "cy")
    val ordered = if (df.columns.contains("id"))
      w.orderBy("z", "x", "y", "id") else w.orderBy("z", "x", "y")
    c.withColumn("rnk", row_number().over(ordered))
      .withColumn("n", count("*").over(w))
      .filter(
        (col("n") % 2 === 0 && (col("rnk") === col("n") / 2 || col("rnk") === col("n") / 2 + 1)) ||
        (col("n") % 2 === 1 && col("rnk") === greatest((col("n") - 1) / 2, lit(1.0))))
      .groupBy("cx", "cy")
      .agg(avg("x").as("x"), avg("y").as("y"), avg("z").as("z"))
  }

  /** pt_blockmedian with return_index=True: the selected median
    * point ids ride along (id_lo = id_hi for odd cells), so medians
    * join back to full-width rows.  Requires an `id` column.
    */
  def blockmedianIdx(scale: Double): DataFrame = {
    val c = df
      .withColumn("cx", GeoOps.cellOf(col("x"), scale))
      .withColumn("cy", GeoOps.cellOf(col("y"), scale))
    val w = Window.partitionBy("cx", "cy")
    c.withColumn("rnk", row_number().over(w.orderBy("z", "x", "y", "id")))
      .withColumn("n", count("*").over(w))
      .filter(
        (col("n") % 2 === 0 && (col("rnk") === col("n") / 2 || col("rnk") === col("n") / 2 + 1)) ||
        (col("n") % 2 === 1 && col("rnk") === greatest((col("n") - 1) / 2, lit(1.0))))
      .groupBy("cx", "cy")
      .agg(avg("x").as("x"), avg("y").as("y"), avg("z").as("z"),
           min("id").as("id_lo"), max("id").as("id_hi"))
  }

  /** blockmax: the max-z point of each cell. */
  def blockmax(scale: Double): DataFrame = {
    val c = df
      .withColumn("cx", GeoOps.cellOf(col("x"), scale))
      .withColumn("cy", GeoOps.cellOf(col("y"), scale))
    val w = Window.partitionBy("cx", "cy")
      .orderBy(col("z").desc, col("x"), col("y"))
    c.withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .drop("rnk")
  }

  /** point_data.get_xy: spherical south-polar stereographic from
    * lat/lon columns (the reference delegates to PROJ).
    */
  def withXY(R: Double = 6378137.0, k0: Double = 0.97276901289): PointFrame = {
    val rho = lit(2.0 * R * k0) * tan(radians((lit(90.0) + col("latitude")) / 2.0))
    copy(df = df
      .withColumn("x", rho * sin(radians(col("longitude"))))
      .withColumn("y", rho * cos(radians(col("longitude")))))
  }

  /** point_data.get_xy with a real CRS (ATL06_tiles.py:221-223 passes
    * EPSG codes to pyproj): ellipsoidal polar stereographic,
    * EPSG:3031 (Antarctic) or EPSG:3413 (Arctic), WGS84.
    */
  def withXY(epsg: Int): PointFrame = {
    val (x, y) = graft.operators.Projections.forward(
      col("latitude"), col("longitude"), epsg)
    copy(df = df.withColumn("x", x).withColumn("y", y))
  }

  /** Inverse projection: recover latitude/longitude from x/y. */
  def withLatLon(epsg: Int): PointFrame = {
    val (lat, lon) = graft.operators.Projections.inverse(col("x"), col("y"), epsg)
    copy(df = df.withColumn("latitude", lat).withColumn("longitude", lon))
  }

  /** geo_index.bin_latlon (geo_index.py:477-487): the geographic
    * coordinates of each occupied bin center — the index frame
    * inverse-projected, no touch of the point data.
    */
  def binLatLon(epsg: Int): DataFrame = {
    val bins = df.select(binX.as("bin_x"), binY.as("bin_y")).distinct()
    val (lat, lon) = graft.operators.Projections.inverse(
      col("bin_x").cast("double"), col("bin_y").cast("double"), epsg)
    bins.withColumn("latitude", lat).withColumn("longitude", lon)
  }

  /** geo_index.to_file: persist as the bin-partitioned layout. */
  def toGeoParquet(path: String, d: Double = delta): Unit =
    graft.sources.GeoParquet.write(df, path, d)

  /** Persist z-order-clustered (Morton-key sorted) — row-group-level
    * 2-D pruning inside big files; see GeoParquet.writeZOrdered.
    */
  def toZOrderedParquet(path: String, d: Double = delta, nFiles: Int = 64): Unit =
    graft.sources.GeoParquet.writeZOrdered(df, path, d, nFiles)

  /** point_data.from_list / append — union of point frames. */
  def union(other: PointFrame): PointFrame =
    copy(df = df.unionByName(other.df, allowMissingColumns = true))

  /** geo_index.query_latlon: project lat/lon to x/y, then bin query. */
  def queryLatLon(latR: (Double, Double), lonR: (Double, Double)): PointFrame =
    copy(df = withXY().df
      .filter(col("latitude").between(latR._1, latR._2) &&
              col("longitude").between(lonR._1, lonR._2)))

  /** geo_index.query_latlon with a real CRS, as ONE call
    * (geo_index.py:328-342): each probe (lat, lon) is forward-
    * projected, snapped to its bin center (`round(x/δ)·δ`, the
    * reference's xb/yb), and every point in a matched bin returns —
    * the reference's bin-set semantics, not an exact lat/lon box
    * filter.  The probe list is query-sized, so the bin set
    * broadcasts; the point side stays wherever its layout put it.
    */
  def queryLatLon(epsg: Int, probes: Seq[(Double, Double)]): PointFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (px, py) = graft.operators.Projections.forward(
      col("latitude"), col("longitude"), epsg)
    val bins = probes.toDF("latitude", "longitude")
      .select(GeoOps.binOf(px, delta).as("__qbx"),
              GeoOps.binOf(py, delta).as("__qby"))
      .distinct()
    copy(df = df.join(broadcast(bins),
      binX === col("__qbx") && binY === col("__qby"), "leftsemi"))
  }

  /** point_data.size */
  def size: Long = df.count()
}

object PointFrame {
  /** geo_index.from_file: open a bin-partitioned layout. */
  def fromGeoParquet(spark: SparkSession, path: String, delta: Double = 100.0): PointFrame =
    PointFrame(graft.sources.GeoParquet.read(spark, path), delta)

  /** `point_data().from_file(file, format)` for any POINT-readable
    * registry kind (`SourceRegistry.pointKinds`) — csv/json/parquet/
    * orc, the Qfit binaries, the GeoTIFF DEM arm, and the real `.h5`
    * granule formats (atl06_h5, atl11_h5, qfit_h5, …), all landing in
    * the canonical (id, x, y, z, t) schema with lat/lon kinds
    * projected through the registry CRS.  Index/adoption kinds
    * (`geoindex`, `indexed_h5`, `indexed_h5_from_matlab`) are not
    * point sources; pass them to `SourceRegistry.forFile` instead.
    */
  def fromSource(spark: SparkSession, kind: String, path: String,
                 delta: Double = 100.0, epsg: Int = 3031): PointFrame =
    PointFrame(
      graft.sources.SourceRegistry.readAs(spark, kind, path, epsg), delta)

  /** Open a layout with pending deletes subtracted (merge-on-read). */
  def fromGeoParquetMerged(spark: SparkSession, path: String,
                           delta: Double = 100.0): PointFrame =
    PointFrame(graft.sources.GeoParquet.readMerged(spark, path), delta)

  /** The layout as of an earlier manifest epoch (snapshot read). */
  def fromGeoParquetAsOf(spark: SparkSession, path: String, epoch: Long,
                         delta: Double = 100.0): PointFrame =
    PointFrame(graft.sources.GeoParquet.queryBoxAsOf(spark, path, epoch,
      (Double.MinValue, Double.MaxValue), (Double.MinValue, Double.MaxValue)),
      delta)

  /** DELETE WHERE on a persisted layout (positional tombstones —
    * no rewrite, pruned reads stay pruned).
    */
  def deleteWhere(spark: SparkSession, path: String, cond: Column): Unit =
    graft.sources.GeoParquet.deleteWhere(spark, path, cond)

  /** MERGE by key into a persisted layout (O(batch), positional). */
  def upsertInto(updates: DataFrame, path: String, keyCol: String,
                 delta: Double = 100.0): Unit =
    graft.sources.GeoParquet.upsertPositional(updates, path, keyCol, delta)
}
