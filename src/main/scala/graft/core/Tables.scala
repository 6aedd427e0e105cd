package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders + the deterministic point-cloud views of SURVEY.md §4.
  *
  * The reference (SmithB/PointDatabase) operates on point clouds
  * `(x, y, z, time)` read from HDF5; the test corpus is TPC-H-ish
  * parquet.  We derive point/track views from `events` with pure
  * integer arithmetic so that the Spark plan and the DuckDB oracle
  * produce bit-identical doubles.
  */
object Tables {

  // Inferred-schema cache, keyed on the source file's identity
  // (path, length, mtime — the sidecar-cache invalidation
  // discipline).  Every one of the 160+ declared queries re-reads its
  // source tables, and each bare `spark.read.parquet` runs a one-task
  // schema-inference job first (~50–100 ms of pure fixed overhead per
  // read at any scale).  The cache stores the exact StructType one
  // inference produced and supplies it explicitly thereafter — zero
  // jobs, bit-identical schema, and any rewrite of the file changes
  // the key.
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The events table carries INT64 TIMESTAMP(NANOS) which Spark only
    // reads as LongType behind this legacy flag; tsMillis() below
    // normalizes either representation to epoch-ms.  Set BEFORE any
    // inference so the cached schema reflects it.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/$name.parquet"
    val key =
      try {
        val f = new java.io.File(path)
        if (f.exists) s"$path#${f.length}#${f.lastModified}" else path
      } catch { case _: Throwable => path }
    val hit = schemaCache.get(key)
    if (hit != null) spark.read.schema(hit).parquet(path)
    else {
      val df = spark.read.parquet(path)
      if (schemaCache.size() > 1024) schemaCache.clear() // growth guard
      schemaCache.put(key, df.schema)
      df
    }
  }

  /** Milliseconds-since-epoch for the events `ts` column, robust to the
    * parquet file using nanosecond (read as long when the legacy flag is
    * set) or micro/millisecond timestamps.
    */
  private def tsMillis(df: DataFrame) = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => expr("ts div 1000000")
    // TIMESTAMP_NTZ (isAdjustedToUTC=false) carries a wall clock; the
    // DuckDB oracle's epoch_ms(ts) treats that wall clock as UTC, and
    // every session here pins spark.sql.session.timeZone=UTC, so the
    // NTZ→LTZ cast reproduces the oracle's epoch exactly.
    case org.apache.spark.sql.types.TimestampNTZType =>
      unix_millis(col("ts").cast(org.apache.spark.sql.types.TimestampType))
    case _ => unix_millis(col("ts"))
  }

  /** events → point cloud (geo_index.py / point_data.py domain).
    * x,y land on a half-unit lattice in [-1000, 1000); z = value.
    */
  def eventsPoints(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    e.select(
      col("event_id").as("id"),
      ((col("event_id") * 7919 % 4000) / lit(2.0) - 1000.0).as("x"),
      ((col("event_id") * col("event_id") % 4001) * 104729 % 4000 / lit(2.0) - lit(1000.0)).as("y"),
      col("value").as("z"),
      tsMillis(e).as("t"),
      col("user_id"),
      col("event_type"))
  }

  /** DuckDB mirror of [[eventsPoints]]. */
  val eventsPointsSql: String =
    """SELECT event_id AS id,
      | (event_id*7919 % 4000)/2.0 - 1000.0 AS x,
      | ((event_id*event_id % 4001)*104729 % 4000)/2.0 - 1000.0 AS y,
      | value AS z, epoch_ms(ts) AS t, user_id, event_type
      |FROM events""".stripMargin

  /** events → along-track view (ATL06 ground tracks).  Eight straight
    * tracks with integer-derived slopes/intercepts chosen so that 9
    * pairs cross inside the data extent (crossover test bed).
    */
  def eventsTracks(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e  = t(spark, dir, "events")
    val tr = e.select(
      col("event_id").as("id"),
      (col("user_id") % 8).cast("long").as("track"),
      col("value").as("z"),
      tsMillis(e).as("t"),
      col("ts"))
    val w = Window.partitionBy("track").orderBy("t", "id")
    tr.withColumn("seq", row_number().over(w).cast("long"))
      .withColumn("x_atc", col("seq") * lit(10.0))
      .withColumn("slope", (col("track") * 37 % 16) - lit(7.5))
      .withColumn("icept", (col("track") * 53 % 11) * lit(50.0))
      .withColumn("x", col("x_atc"))
      .withColumn("y", col("slope") * col("x_atc") + col("icept"))
      .select("track", "seq", "id", "x_atc", "x", "y", "z", "t")
  }

  /** DuckDB mirror of [[eventsTracks]]. */
  val eventsTracksSql: String =
    """SELECT track, seq, id, x_atc, x_atc AS x,
      | ((track*37 % 16) - 7.5) * x_atc + (track*53 % 11)*50.0 AS y,
      | z, t
      |FROM (
      |  SELECT event_id AS id, CAST(user_id % 8 AS BIGINT) AS track,
      |    value AS z, epoch_ms(ts) AS t,
      |    row_number() OVER (PARTITION BY user_id % 8
      |                       ORDER BY epoch_ms(ts), event_id) AS seq,
      |    row_number() OVER (PARTITION BY user_id % 8
      |                       ORDER BY epoch_ms(ts), event_id) * (10.0::DOUBLE) AS x_atc
      |  FROM events)""".stripMargin

  /** lineitem → ATL06 segment-quality analogs (ATL06_filters.py
    * domain): the filter thresholds see the same shapes of data the
    * reference filters see.
    */
  def lineitemAtl06(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem").select(
      col("l_orderkey"),
      col("l_linenumber"),
      (col("l_extendedprice") / 100.0).as("h_li"),
      (col("l_discount") * 2.0).as("h_li_sigma"),
      (col("l_tax") * 5.0).as("h_robust_sprd"),
      ((col("l_partkey") % 100) / lit(1000.0)).as("snr_significance"),
      (col("l_linenumber") * 4).cast("long").as("n_fit_photons"),
      (col("l_suppkey") % 40).cast("long").as("fpb_n_corr"),
      col("l_quantity").as("w_surface_window_final"),
      (col("l_suppkey") % 2).cast("long").as("beam_strong"))

  /** DuckDB mirror of [[lineitemAtl06]]. */
  val lineitemAtl06Sql: String =
    """SELECT l_orderkey, l_linenumber,
      | l_extendedprice/100.0 AS h_li,
      | l_discount*2.0 AS h_li_sigma,
      | l_tax*5.0 AS h_robust_sprd,
      | (l_partkey % 100)/1000.0 AS snr_significance,
      | CAST(l_linenumber*4 AS BIGINT) AS n_fit_photons,
      | CAST(l_suppkey % 40 AS BIGINT) AS fpb_n_corr,
      | l_quantity AS w_surface_window_final,
      | CAST(l_suppkey % 2 AS BIGINT) AS beam_strong
      |FROM lineitem""".stripMargin
}
