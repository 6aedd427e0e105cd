package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Spark-native re-expression of the reference's spatial index
  * (geo_index.py) and block aggregation (pt_blockmedian.py,
  * blockmax.py).
  *
  * The reference materializes, per δ-spaced bin, the list of
  * (file, offset_start, offset_end) runs so that a query touches only
  * matching byte ranges of HDF5 files.  On Spark+Parquet the same role
  * is played by bin columns computed in the scan projection: a
  * "geo index" is just the bin-level rollup DataFrame, and a query is
  * a filter/semi-join on bin keys that Catalyst pushes toward the
  * scan.  At 100 TB the bin columns are written with the data
  * (partition/bucket layout), so these rollups read only footer
  * statistics and queries prune row groups for free.
  */
object GeoOps {

  /** round(v/delta)*delta — bin center, as the reference's
    * geo_index.from_xy (geo_index.py:76).  Both Spark and DuckDB round
    * ties away from zero, so the mirror SQL is bit-identical.
    */
  def binOf(c: Column, delta: Double): Column =
    (round(c / delta) * delta).cast("long")

  /** floor((v-v0)/delta) — cell index as pt_blockmedian.py:21-22. */
  def cellOf(c: Column, delta: Double): Column =
    floor(c / delta).cast("long")

  private def pts(s: SparkSession, dir: String) = Tables.eventsPoints(s, dir)
  private val P = Tables.eventsPointsSql

  // --- 1. geo_index build: per-bin inventory (geo_index.py:71-100) ---
  def geoindexBuild(s: SparkSession, dir: String): DataFrame =
    pts(s, dir)
      .select(binOf(col("x"), 100).as("bin_x"), binOf(col("y"), 100).as("bin_y"), col("id"))
      .groupBy("bin_x", "bin_y")
      .agg(count("*").as("n_points"), min("id").as("id_min"), max("id").as("id_max"))
      .orderBy("bin_x", "bin_y")

  val geoindexBuildSql: String =
    s"""WITH pts AS ($P)
       |SELECT CAST(round(x/100.0)*100 AS BIGINT) AS bin_x,
       |       CAST(round(y/100.0)*100 AS BIGINT) AS bin_y,
       |       count(*) AS n_points, min(id) AS id_min, max(id) AS id_max
       |FROM pts GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  // --- 1b. geo_index.from_list: merge of per-source indexes (geo_index.py:114-172) ---
  /** The reference builds one index per input file and merges them
    * (`from_list`): a bin present in several sources concatenates its
    * run lists.  Spark-first, the partial index of a source is that
    * source's bin rollup, and the merge is a union + re-aggregation on
    * the bin key — an associative combine, so merging 1000 per-file
    * indexes is ONE shuffle of index-sized frames (bins, not points;
    * at 100 TB the index frame is MBs).  Here three disjoint sources
    * (`id % 3` — the per-file split analog) are indexed independently
    * and merged; the oracle indexes the unioned data directly, so the
    * hash-match proves the merge law: merge(index(s_i)) == index(∪ s_i),
    * with `n_sources` pinning per-bin source multiplicity.
    */
  def mergeIndexes(indexes: Seq[DataFrame]): DataFrame =
    indexes.reduce(_ unionByName _)
      .groupBy("bin_x", "bin_y")
      .agg(sum("n_points").cast("long").as("n_points"),
        min("id_min").as("id_min"), max("id_max").as("id_max"),
        count("*").cast("long").as("n_sources"))

  def indexMerge(s: SparkSession, dir: String): DataFrame = {
    val base = pts(s, dir)
    val partials = (0 to 2).map { i =>
      base.filter(col("id") % 3 === i)
        .select(binOf(col("x"), 200).as("bin_x"), binOf(col("y"), 200).as("bin_y"), col("id"))
        .groupBy("bin_x", "bin_y")
        .agg(count("*").as("n_points"), min("id").as("id_min"), max("id").as("id_max"))
    }
    mergeIndexes(partials).orderBy("bin_x", "bin_y")
  }

  val indexMergeSql: String =
    s"""WITH pts AS ($P),
       |b AS (SELECT CAST(round(x/200.0)*200 AS BIGINT) AS bin_x,
       |             CAST(round(y/200.0)*200 AS BIGINT) AS bin_y,
       |             id, id % 3 AS src FROM pts)
       |SELECT bin_x, bin_y, count(*) AS n_points, min(id) AS id_min,
       |       max(id) AS id_max, CAST(count(DISTINCT src) AS BIGINT) AS n_sources
       |FROM b GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  // --- 2. query_xy_box: bin-granular box query (geo_index.py:344-349) ---
  def geoQueryBox(s: SparkSession, dir: String): DataFrame =
    pts(s, dir)
      .withColumn("bin_x", binOf(col("x"), 100))
      .withColumn("bin_y", binOf(col("y"), 100))
      // the raw-range predicate is implied by the bin predicate
      // (bin = round(v/δ)·δ ⇒ v ∈ [bin−δ/2, bin+δ/2)); stating it
      // explicitly gives parquet min/max row-group pruning a sargable
      // filter, which the computed bin column can never be
      .filter(col("x") >= -250.0 && col("x") < 450.0 &&
              col("y") >= -350.0 && col("y") < 350.0)
      .filter(col("bin_x").between(-200, 400) && col("bin_y").between(-300, 300))
      .select("id", "x", "y", "z", "t")
      .orderBy("id")

  val geoQueryBoxSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y, z, t FROM pts
       |WHERE CAST(round(x/100.0)*100 AS BIGINT) BETWEEN -200 AND 400
       |  AND CAST(round(y/100.0)*100 AS BIGINT) BETWEEN -300 AND 300
       |ORDER BY id""".stripMargin

  // --- 2b. box query THROUGH the written geo-layout (geo_index.py to_file → query_xy_box) ---
  /** The full to_file → from_file → query cycle as one oracle-checked
    * query: write the point cloud as the bin-partitioned GeoParquet
    * layout, then box-query it — the read scans only matching bin
    * directories (PartitionFilters; proven in GeoParquetSpec), which
    * is the honest 100-TB pruning story, here exercised end-to-end
    * against the DuckDB oracle rather than only in a plan spec.
    */
  def geoLayoutQuery(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("geolayout").toString
    graft.sources.GeoParquet.write(
      pts(s, dir).select("id", "x", "y", "z"), path, 100.0)
    graft.sources.GeoParquet.queryBox(s, path, (-200L, 400L), (-300L, 300L))
      .select("id", "x", "y", "z")
      .orderBy("id")
  }

  val geoLayoutQuerySql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y, z FROM pts
       |WHERE CAST(round(x/100.0)*100 AS BIGINT) BETWEEN -200 AND 400
       |  AND CAST(round(y/100.0)*100 AS BIGINT) BETWEEN -300 AND 300
       |ORDER BY id""".stripMargin

  // --- 3. query_xy with pad: dilate query bins by ±1 (geo_index.py:363-..., pad_bins 591-603) ---
  def geoQueryPad(s: SparkSession, dir: String): DataFrame = {
    val p = pts(s, dir)
      .withColumn("bin_x", binOf(col("x"), 100))
      .withColumn("bin_y", binOf(col("y"), 100))
    val queryBins = p
      .filter(col("event_type") === "click" && col("z") > 200)
      .select("bin_x", "bin_y").distinct()
    val off = s.range(-1, 2).select(col("id").as("o"))
    val dilated = queryBins
      .crossJoin(broadcast(off.select((col("o") * 100).as("ox"))))
      .crossJoin(broadcast(off.select((col("o") * 100).as("oy"))))
      .select((col("bin_x") + col("ox")).as("bin_x"), (col("bin_y") + col("oy")).as("bin_y"))
      .distinct()
    p.join(broadcast(dilated), Seq("bin_x", "bin_y"), "leftsemi")
      .select("id", "x", "y", "z")
      .orderBy("id")
  }

  val geoQueryPadSql: String =
    s"""WITH pts AS ($P),
       |b AS (SELECT *, CAST(round(x/100.0)*100 AS BIGINT) AS bin_x,
       |             CAST(round(y/100.0)*100 AS BIGINT) AS bin_y FROM pts),
       |qb AS (SELECT DISTINCT bin_x, bin_y FROM b
       |       WHERE event_type = 'click' AND z > 200),
       |dil AS (SELECT DISTINCT qb.bin_x + ox.v AS bin_x, qb.bin_y + oy.v AS bin_y
       |        FROM qb, (VALUES (-100),(0),(100)) ox(v), (VALUES (-100),(0),(100)) oy(v))
       |SELECT id, x, y, z FROM b
       |WHERE EXISTS (SELECT 1 FROM dil
       |              WHERE dil.bin_x = b.bin_x AND dil.bin_y = b.bin_y)
       |ORDER BY id""".stripMargin

  // --- 4. intersect of two indexes (geo_index.py:351-361) ---
  def geoIntersect(s: SparkSession, dir: String): DataFrame = {
    val p = pts(s, dir)
      .withColumn("bin_x", binOf(col("x"), 100))
      .withColumn("bin_y", binOf(col("y"), 100))
    val a = p.filter(col("user_id") % 2 === 0).select("bin_x", "bin_y").distinct()
    val b = p.filter(col("user_id") % 2 === 1).select("bin_x", "bin_y").distinct()
    a.join(b, Seq("bin_x", "bin_y")).orderBy("bin_x", "bin_y")
  }

  val geoIntersectSql: String =
    s"""WITH pts AS ($P),
       |b AS (SELECT *, CAST(round(x/100.0)*100 AS BIGINT) AS bin_x,
       |             CAST(round(y/100.0)*100 AS BIGINT) AS bin_y FROM pts),
       |a1 AS (SELECT DISTINCT bin_x, bin_y FROM b WHERE user_id % 2 = 0),
       |a2 AS (SELECT DISTINCT bin_x, bin_y FROM b WHERE user_id % 2 = 1)
       |SELECT a1.bin_x, a1.bin_y FROM a1 JOIN a2 USING (bin_x, bin_y)
       |ORDER BY 1,2""".stripMargin

  // --- 4b. intersect with pad (geo_index.py:351-361, pad arg) ---
  /** geo_index.intersect(other, pad=[1,1]): dilate one index's bin set
    * by ±1 bin in each axis (the pad_bins machinery of geo_index.py:
    * 591-603) before intersecting — bins of B adjacent to any bin of A
    * count as overlap.  The dilation is a 9-row broadcast cross join
    * on the *bin inventory* (tiny), never on the point data.
    */
  def geoIntersectPad(s: SparkSession, dir: String): DataFrame = {
    val p = pts(s, dir)
      .withColumn("bin_x", binOf(col("x"), 100))
      .withColumn("bin_y", binOf(col("y"), 100))
    val a = p.filter(col("user_id") % 2 === 0).select("bin_x", "bin_y").distinct()
    val b = p.filter(col("user_id") % 2 === 1).select("bin_x", "bin_y").distinct()
    val off = s.range(-1, 2).select((col("id") * 100).as("o"))
    a.crossJoin(broadcast(off.select(col("o").as("ox"))))
      .crossJoin(broadcast(off.select(col("o").as("oy"))))
      .select((col("bin_x") + col("ox")).as("bin_x"), (col("bin_y") + col("oy")).as("bin_y"))
      .distinct()
      .join(b, Seq("bin_x", "bin_y"))
      .orderBy("bin_x", "bin_y")
  }

  val geoIntersectPadSql: String =
    s"""WITH pts AS ($P),
       |b AS (SELECT *, CAST(round(x/100.0)*100 AS BIGINT) AS bin_x,
       |             CAST(round(y/100.0)*100 AS BIGINT) AS bin_y FROM pts),
       |a1 AS (SELECT DISTINCT bin_x, bin_y FROM b WHERE user_id % 2 = 0),
       |a2 AS (SELECT DISTINCT bin_x, bin_y FROM b WHERE user_id % 2 = 1),
       |dil AS (SELECT DISTINCT a1.bin_x + ox.v AS bin_x, a1.bin_y + oy.v AS bin_y
       |        FROM a1, (VALUES (-100),(0),(100)) ox(v), (VALUES (-100),(0),(100)) oy(v))
       |SELECT dil.bin_x, dil.bin_y FROM dil JOIN a2 USING (bin_x, bin_y)
       |ORDER BY 1,2""".stripMargin

  // --- 5. unique_points (geo_index.py:585-589) ---
  def uniquePoints(s: SparkSession, dir: String): DataFrame =
    pts(s, dir)
      .filter(col("z") < 100)
      .select(binOf(col("x"), 10).as("ux"), binOf(col("y"), 10).as("uy"))
      .distinct()
      .orderBy("ux", "uy")

  val uniquePointsSql: String =
    s"""WITH pts AS ($P)
       |SELECT DISTINCT CAST(round(x/10.0)*10 AS BIGINT) AS ux,
       |       CAST(round(y/10.0)*10 AS BIGINT) AS uy
       |FROM pts WHERE z < 100 ORDER BY 1,2""".stripMargin

  // --- 6. offset-run coalescing (geo_index.py:410-429) ---
  /** The reference merges adjacent [offset_start, offset_end] runs per
    * bin; the Spark form is gaps-and-islands over the sorted ids.
    */
  def offsetCoalesce(s: SparkSession, dir: String): DataFrame = {
    val p = pts(s, dir).filter(col("z") > 150)
      .select(binOf(col("x"), 200).as("bin_x"), binOf(col("y"), 200).as("bin_y"), col("id"))
    val w = Window.partitionBy("bin_x", "bin_y").orderBy("id")
    p.withColumn("island", col("id") - row_number().over(w))
      .groupBy("bin_x", "bin_y", "island")
      .agg(min("id").as("run_start"), max("id").as("run_end"), count("*").as("run_len"))
      .drop("island")
      .orderBy("bin_x", "bin_y", "run_start")
  }

  val offsetCoalesceSql: String =
    s"""WITH pts AS ($P),
       |f AS (SELECT CAST(round(x/200.0)*200 AS BIGINT) AS bin_x,
       |             CAST(round(y/200.0)*200 AS BIGINT) AS bin_y, id
       |      FROM pts WHERE z > 150),
       |i AS (SELECT *, id - row_number() OVER (PARTITION BY bin_x, bin_y ORDER BY id) AS island
       |      FROM f)
       |SELECT bin_x, bin_y, min(id) AS run_start, max(id) AS run_end,
       |       count(*) AS run_len
       |FROM i GROUP BY bin_x, bin_y, island ORDER BY bin_x, bin_y, run_start""".stripMargin

  // --- 7. pt_blockmedian: exact middle-point selection (pt_blockmedian.py:9-64) ---
  /** Per δ-cell, sort by z and *select* the middle point: even n →
    * mean of the two middle points (ranks n/2, n/2+1); odd n → the
    * point with 1-based rank max((n-1)/2, 1), reproducing the
    * reference's index arithmetic (pt_blockmedian.py:39-57) exactly.
    * A selection, not an approximate percentile — survives any scale
    * because it is one rank-window + one groupBy on the cell key.
    */
  def blockmedian(s: SparkSession, dir: String): DataFrame = {
    val d = 50.0
    val c = pts(s, dir)
      .withColumn("cx", cellOf(col("x"), d))
      .withColumn("cy", cellOf(col("y"), d))
    val w = Window.partitionBy("cx", "cy")
    val r = c
      .withColumn("rnk", row_number().over(w.orderBy("z", "x", "y", "id")))
      .withColumn("n", count("*").over(w))
    r.filter(
        (col("n") % 2 === 0 && (col("rnk") === col("n") / 2 || col("rnk") === col("n") / 2 + 1)) ||
        (col("n") % 2 === 1 && col("rnk") === greatest((col("n") - 1) / 2, lit(1.0))))
      .groupBy("cx", "cy")
      .agg(avg("x").as("xm"), avg("y").as("ym"), avg("z").as("zm"))
      .orderBy("cx", "cy")
  }

  val blockmedianSql: String =
    s"""WITH pts AS ($P),
       |c AS (SELECT *, CAST(floor(x/50.0) AS BIGINT) AS cx,
       |             CAST(floor(y/50.0) AS BIGINT) AS cy FROM pts),
       |r AS (SELECT *, row_number() OVER (PARTITION BY cx, cy ORDER BY z, x, y, id) AS rnk,
       |             count(*) OVER (PARTITION BY cx, cy) AS n FROM c)
       |SELECT cx, cy, avg(x) AS xm, avg(y) AS ym, avg(z) AS zm
       |FROM r
       |WHERE (n % 2 = 0 AND (rnk = n/2 OR rnk = n/2 + 1))
       |   OR (n % 2 = 1 AND rnk = greatest((n-1)/2, 1.0))
       |GROUP BY cx, cy ORDER BY cx, cy""".stripMargin

  // --- 7b. blockmedian with return_index (pt_blockmedian.py:9, index arg) ---
  /** The reference's `return_index=True` hands back the row indices of
    * the selected median points so callers can join the medians back
    * to full-width rows.  Same selection as [[blockmedian]], plus the
    * selected ids: odd n → id_lo = id_hi = the median point's id; even
    * n → the ids of the two averaged middle points.
    */
  def blockmedianIdx(s: SparkSession, dir: String): DataFrame = {
    val d = 50.0
    val c = pts(s, dir)
      .withColumn("cx", cellOf(col("x"), d))
      .withColumn("cy", cellOf(col("y"), d))
    val w = Window.partitionBy("cx", "cy")
    val r = c
      .withColumn("rnk", row_number().over(w.orderBy("z", "x", "y", "id")))
      .withColumn("n", count("*").over(w))
    r.filter(
        (col("n") % 2 === 0 && (col("rnk") === col("n") / 2 || col("rnk") === col("n") / 2 + 1)) ||
        (col("n") % 2 === 1 && col("rnk") === greatest((col("n") - 1) / 2, lit(1.0))))
      .groupBy("cx", "cy")
      .agg(avg("x").as("xm"), avg("y").as("ym"), avg("z").as("zm"),
           min("id").as("id_lo"), max("id").as("id_hi"))
      .orderBy("cx", "cy")
  }

  val blockmedianIdxSql: String =
    s"""WITH pts AS ($P),
       |c AS (SELECT *, CAST(floor(x/50.0) AS BIGINT) AS cx,
       |             CAST(floor(y/50.0) AS BIGINT) AS cy FROM pts),
       |r AS (SELECT *, row_number() OVER (PARTITION BY cx, cy ORDER BY z, x, y, id) AS rnk,
       |             count(*) OVER (PARTITION BY cx, cy) AS n FROM c)
       |SELECT cx, cy, avg(x) AS xm, avg(y) AS ym, avg(z) AS zm,
       |       min(id) AS id_lo, max(id) AS id_hi
       |FROM r
       |WHERE (n % 2 = 0 AND (rnk = n/2 OR rnk = n/2 + 1))
       |   OR (n % 2 = 1 AND rnk = greatest((n-1)/2, 1.0))
       |GROUP BY cx, cy ORDER BY cx, cy""".stripMargin

  // --- 8. blockmax point selection (blockmax.py:10-31) ---
  def blockmax(s: SparkSession, dir: String): DataFrame = {
    val d = 50.0
    val c = pts(s, dir)
      .withColumn("cx", cellOf(col("x"), d))
      .withColumn("cy", cellOf(col("y"), d))
    val w = Window.partitionBy("cx", "cy").orderBy(col("z").desc, col("x"), col("y"), col("id"))
    c.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select("cx", "cy", "x", "y", "z")
      .orderBy("cx", "cy")
  }

  val blockmaxSql: String =
    s"""WITH pts AS ($P),
       |c AS (SELECT *, CAST(floor(x/50.0) AS BIGINT) AS cx,
       |             CAST(floor(y/50.0) AS BIGINT) AS cy FROM pts),
       |r AS (SELECT *, row_number() OVER (PARTITION BY cx, cy
       |             ORDER BY z DESC, x, y, id) AS rnk FROM c)
       |SELECT cx, cy, x, y, z FROM r WHERE rnk = 1 ORDER BY cx, cy""".stripMargin

  // --- 9. block stats (count/min/max/mean per cell) ---
  /** Exact mean via integer cents (value has 2 decimals) so the oracle
    * hash-matches regardless of float summation order.
    */
  def blockStats(s: SparkSession, dir: String): DataFrame = {
    val d = 100.0
    pts(s, dir)
      .withColumn("cx", cellOf(col("x"), d))
      .withColumn("cy", cellOf(col("y"), d))
      .groupBy("cx", "cy")
      .agg(count("*").as("n"),
           min("z").as("z_min"),
           max("z").as("z_max"),
           sum(round(col("z") * 100).cast("long")).as("z_sum_cents"))
      .withColumn("z_mean", col("z_sum_cents") / 100.0 / col("n"))
      .orderBy("cx", "cy")
  }

  val blockStatsSql: String =
    s"""WITH pts AS ($P),
       |c AS (SELECT *, CAST(floor(x/100.0) AS BIGINT) AS cx,
       |             CAST(floor(y/100.0) AS BIGINT) AS cy FROM pts),
       |g AS (SELECT cx, cy, count(*) AS n, min(z) AS z_min, max(z) AS z_max,
       |             CAST(sum(CAST(round(z*100) AS BIGINT)) AS BIGINT) AS z_sum_cents
       |      FROM c GROUP BY cx, cy)
       |SELECT cx, cy, n, z_min, z_max, z_sum_cents,
       |       z_sum_cents/100.0/n AS z_mean
       |FROM g ORDER BY cx, cy""".stripMargin

  // --- 6b. hierarchical index: index-of-indexes rollup (geo_index.py:114-172,
  //     ATL06_tiles.py:231-245 index_cycle_indices) ---
  /** The reference builds coarse indexes over fine indexes
    * (from_list over per-cycle GeoIndex files).  Here: roll the
    * δ=100 bin inventory up to δ=500 super-bins — a re-aggregation
    * of the index frame itself, no touch of the point data.
    */
  def hierIndex(s: SparkSession, dir: String): DataFrame =
    geoindexBuild(s, dir)
      .groupBy((round(col("bin_x") / 500.0) * 500).cast("long").as("super_x"),
               (round(col("bin_y") / 500.0) * 500).cast("long").as("super_y"))
      .agg(count("*").as("n_bins"), sum("n_points").as("n_points"),
           min("id_min").as("id_min"), max("id_max").as("id_max"))
      .orderBy("super_x", "super_y")

  val hierIndexSql: String =
    s"""WITH pts AS ($P),
       |fine AS (
       |  SELECT CAST(round(x/100.0)*100 AS BIGINT) AS bin_x,
       |         CAST(round(y/100.0)*100 AS BIGINT) AS bin_y,
       |         count(*) AS n_points, min(id) AS id_min, max(id) AS id_max
       |  FROM pts GROUP BY 1,2)
       |SELECT CAST(round(bin_x/500.0)*500 AS BIGINT) AS super_x,
       |       CAST(round(bin_y/500.0)*500 AS BIGINT) AS super_y,
       |       count(*) AS n_bins, CAST(sum(n_points) AS BIGINT) AS n_points,
       |       min(id_min) AS id_min, max(id_max) AS id_max
       |FROM fine GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  // --- sketch rollup: approximate distinct visitors per super-bin ---
  /** The sketch variant of the hierarchical index rollup: per coarse
    * bin, the approximate distinct user count via Spark's native
    * HLL++ (`approx_count_distinct`) next to the exact one.  At
    * 100 TB the exact `countDistinct` is a full shuffle of every
    * (bin, user) pair, while the sketch is a fixed-size mergeable
    * state per bin — the standard trade for cardinality dashboards.
    * Sketch internals differ across engines, so this is spec-verified
    * (error bound vs exact) rather than oracle-hashed.
    */
  def binApproxUsers(s: SparkSession, dir: String, rsd: Double = 0.02): DataFrame =
    pts(s, dir)
      .withColumn("bin_x", binOf(col("x"), 500))
      .withColumn("bin_y", binOf(col("y"), 500))
      .groupBy("bin_x", "bin_y")
      .agg(approx_count_distinct("user_id", rsd).as("approx_users"),
           countDistinct("user_id").as("exact_users"))
      .orderBy("bin_x", "bin_y")

  // --- 19. make_tile: tile + bin key assignment (ATL06_tiles.py:30-107) ---
  def tileAssign(s: SparkSession, dir: String): DataFrame =
    pts(s, dir)
      .withColumn("tile_e", (floor(col("x") / 500) * 500).cast("long"))
      .withColumn("tile_n", (floor(col("y") / 500) * 500).cast("long"))
      .withColumn("bin_x", binOf(col("x"), 100))
      .withColumn("bin_y", binOf(col("y"), 100))
      .groupBy("tile_e", "tile_n", "bin_x", "bin_y")
      .agg(count("*").as("n"), min("id").as("id_min"))
      .orderBy("tile_e", "tile_n", "bin_x", "bin_y")

  val tileAssignSql: String =
    s"""WITH pts AS ($P)
       |SELECT CAST(floor(x/500.0)*500 AS BIGINT) AS tile_e,
       |       CAST(floor(y/500.0)*500 AS BIGINT) AS tile_n,
       |       CAST(round(x/100.0)*100 AS BIGINT) AS bin_x,
       |       CAST(round(y/100.0)*100 AS BIGINT) AS bin_y,
       |       count(*) AS n, min(id) AS id_min
       |FROM pts GROUP BY 1,2,3,4 ORDER BY 1,2,3,4""".stripMargin

  // --- 20. index_tiles: per-tile inventory (ATL06_tiles.py:212-229) ---
  def tileIndex(s: SparkSession, dir: String): DataFrame =
    pts(s, dir)
      .withColumn("tile_e", (floor(col("x") / 500) * 500).cast("long"))
      .withColumn("tile_n", (floor(col("y") / 500) * 500).cast("long"))
      .withColumn("bin_x", binOf(col("x"), 100))
      .withColumn("bin_y", binOf(col("y"), 100))
      .groupBy("tile_e", "tile_n")
      .agg(countDistinct(col("bin_x"), col("bin_y")).as("n_bins"),
           count("*").as("n_points"),
           min("id").as("id_min"), max("id").as("id_max"))
      .orderBy("tile_e", "tile_n")

  val tileIndexSql: String =
    s"""WITH pts AS ($P),
       |b AS (SELECT *, CAST(floor(x/500.0)*500 AS BIGINT) AS tile_e,
       |             CAST(floor(y/500.0)*500 AS BIGINT) AS tile_n,
       |             CAST(round(x/100.0)*100 AS BIGINT) AS bin_x,
       |             CAST(round(y/100.0)*100 AS BIGINT) AS bin_y FROM pts)
       |SELECT tile_e, tile_n, count(DISTINCT (bin_x, bin_y)) AS n_bins,
       |       count(*) AS n_points, min(id) AS id_min, max(id) AS id_max
       |FROM b GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  // --- 61. z-order clustering key (write-time layout, Delta/Iceberg Z-ORDER) ---
  /** The Morton key of each point's δ=50 cell — sorting the corpus by
    * this single key makes contiguous row ranges compact in x AND y
    * simultaneously (see [[graft.functions.ZOrder]] and
    * GeoParquet.writeZOrdered for the layout side).
    */
  def zorderKey(s: SparkSession, dir: String): DataFrame =
    pts(s, dir)
      .select(col("id"), cellOf(col("x"), 50).as("cell_x"), cellOf(col("y"), 50).as("cell_y"))
      .withColumn("zkey", graft.functions.ZOrder.zkey(col("cell_x"), col("cell_y")))
      .orderBy("id")

  val zorderKeySql: String =
    s"""WITH pts AS ($P),
       |c AS (SELECT id, CAST(floor(x/50.0) AS BIGINT) AS cell_x,
       |             CAST(floor(y/50.0) AS BIGINT) AS cell_y FROM pts)
       |SELECT id, cell_x, cell_y,
       |  ${graft.functions.ZOrder.zkeySql("cell_x", "cell_y")} AS zkey
       |FROM c ORDER BY id""".stripMargin

  // --- 61b. Hilbert curve key (tighter-locality layout sibling) ---
  /** The Hilbert index of each point's δ=50 cell — same role as
    * [[zorderKey]] with strictly better chunk locality (consecutive
    * keys are always Manhattan-adjacent cells; see
    * [[graft.functions.Hilbert]]).
    */
  def hilbertKey(s: SparkSession, dir: String): DataFrame =
    pts(s, dir).select(col("id"),
        cellOf(col("x"), 50).as("cell_x"), cellOf(col("y"), 50).as("cell_y"))
      .withColumn("hkey",
        graft.functions.Hilbert.dkey(col("cell_x"), col("cell_y")))
      .orderBy("id")

  val hilbertKeySql: String = {
    val (chain, finalRel) = graft.functions.Hilbert.dkeySqlChain(
      "c", "cell_x", "cell_y", Seq("id", "cell_x", "cell_y"), "hkey")
    s"""WITH pts AS ($P),
       |c AS (SELECT id, CAST(floor(x/50.0) AS BIGINT) AS cell_x,
       |             CAST(floor(y/50.0) AS BIGINT) AS cell_y FROM pts),
       |$chain
       |SELECT id, cell_x, cell_y, hkey FROM $finalRel ORDER BY id""".stripMargin
  }

  // --- 61d. BIGMIN curve-range read (geo_index.py:410-429 offset-run
  // pruning analog): write a z-ordered layout + manifest, then box
  // query through the curve-key ranges; the exact x/y re-filter makes
  // the result a plain box select, so the oracle is trivial while the
  // Spark side exercises decompose → manifest k0/k1 file pruning →
  // key-range row-group pushdown end to end.
  def curveQuery(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("curveq").toString
    graft.sources.GeoParquet.writeZOrdered(
      pts(s, dir).select("id", "x", "y", "z"), path, 50.0, 16)
    graft.sources.GeoParquet.writeManifest(s, path)
    graft.sources.GeoParquet
      .queryBoxCurve(s, path, (-150.0, 150.0), (-150.0, 150.0), 50.0)
      .select("id", "x", "y", "z")
      .orderBy("id")
  }

  val curveQuerySql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y, z FROM pts
       |WHERE x >= -150 AND x < 150 AND y >= -150 AND y < 150
       |ORDER BY id""".stripMargin

  // --- 61e. Hilbert BIGMIN read over an INCREMENTALLY grown layout:
  // base write (even ids) + appendCurve of the rest (the O(batch)
  // ingest path that keeps the manifest fresh without a rewrite),
  // then a curve-range box read.  The exact x/y re-filter makes the
  // oracle the plain box select over ALL points — rows lost to a
  // mis-maintained manifest or ranges miscomputed for the Hilbert
  // kernel would hash-mismatch.
  def curveQueryH(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("curveqh").toString
    val p = pts(s, dir).select("id", "x", "y", "z")
    graft.sources.GeoParquet.writeHilbertClustered(
      p.filter(col("id") % 2 === 0), path, 50.0, 8)
    graft.sources.GeoParquet.writeManifest(s, path)
    graft.sources.GeoParquet.appendCurve(
      p.filter(col("id") % 2 === 1), path, 50.0, 4)
    graft.sources.GeoParquet
      .queryBoxCurve(s, path, (-150.0, 150.0), (-150.0, 150.0), 50.0)
      .select("id", "x", "y", "z")
      .orderBy("id")
  }

  val curveQueryHSql: String = curveQuerySql

  // --- 61f. manifest-answered box count: interior files contribute
  // manifest n_rows unopened; only boundary-straddling files are
  // scanned (perimeter-not-area planning; the reference's quick
  // cardinality probe is a geo_index query + len()).
  def countBox(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("countbox").toString
    graft.sources.GeoParquet.writeZOrdered(
      pts(s, dir).select("id", "x", "y", "z"), path, 50.0, 16)
    graft.sources.GeoParquet.writeManifest(s, path)
    graft.sources.GeoParquet
      .countBoxViaManifest(s, path, (-200.0, 200.0), (-200.0, 200.0))
  }

  /** 61z: the SQL/catalog face — `spark.sql` over a manifested layout
    * through the DataSourceV2 provider (`format("graft")`,
    * [[graft.sources.v2.GraftSource]]).  The scan's file planning is
    * the same manifest envelope pruning queryBoxViaManifest does, so
    * this query opens only box-intersecting files, from plain SQL.
    */
  def sqlBox(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("sqlbox").toString
    graft.sources.GeoParquet.write(
      pts(s, dir).select("id", "x", "y", "z"), path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)
    s.read.format("graft").load(path).createOrReplaceTempView("graft_sql_box")
    s.sql("""SELECT id, x, y, z FROM graft_sql_box
            |WHERE x >= -500 AND x < 500 AND y >= -500 AND y < 500
            |ORDER BY id""".stripMargin)
  }

  val sqlBoxSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y, z FROM pts
       |WHERE x >= -500 AND x < 500 AND y >= -500 AND y < 500
       |ORDER BY id""".stripMargin

  /** 61z2: aggregate pushdown through the SQL face — the SQL twin of
    * `q_count_box`/`q_minmax_box`: COUNT/MIN/MAX with a box filter
    * push into the DSv2 scan ([[graft.sources.v2.GraftAggScan]]),
    * interior files answer from the manifest stats unopened (their
    * `cn` non-null counts prove every row passes), and only
    * boundary-straddling files are scanned.  The oracle is the plain
    * aggregate, so a containment off-by-one (strict bounds, null
    * handling) hash-mismatches.
    */
  def sqlAgg(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("sqlagg").toString
    graft.sources.GeoParquet.write(
      pts(s, dir).select("id", "x", "y", "z"), path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)
    s.read.format("graft").load(path).createOrReplaceTempView("graft_sql_agg")
    s.sql("""SELECT count(*) AS n, count(z) AS nz,
            |       min(z) AS z_min, max(z) AS z_max
            |FROM graft_sql_agg
            |WHERE x >= -200 AND x < 200 AND y >= -200 AND y < 200""".stripMargin)
  }

  val sqlAggSql: String =
    s"""WITH pts AS ($P)
       |SELECT count(*) AS n, count(z) AS nz,
       |       min(z) AS z_min, max(z) AS z_max
       |FROM pts
       |WHERE x >= -200 AND x < 200 AND y >= -200 AND y < 200""".stripMargin

  /** 61z40: SUM/AVG aggregate pushdown — the manifest's per-file sums
    * (`cs` stats, written by every manifest commit) serve interior
    * files unopened, completing the dashboard-aggregate family
    * (COUNT 61g/61z19, MIN/MAX 61i/61z37, now SUM — and AVG for
    * free: Spark rewrites it to Sum/Count under partial pushdown).
    * The gate's layout stores INTEGRAL-valued doubles (floor(z)), so
    * the file-partial → merge association is bit-exact against the
    * oracle's single-pass sum; the in-query assertion pins that
    * interior files were manifest-answered.  A dropped file, a
    * boundary double-count, or a sum served from a stale stat
    * hash-mismatches.
    */
  def sqlSum(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("sqlsum").toString
    graft.sources.GeoParquet.write(
      pts(s, dir).select(col("id"), col("x"), col("y"),
        // Spark floor -> BIGINT; keep z DOUBLE so both engines sum
        // doubles (integral-VALUED, so association stays bit-exact)
        floor(col("z")).cast("double").as("z")), path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)
    s.read.format("graft").load(path).createOrReplaceTempView("graft_sql_sum")
    val out = s.sql(
      """SELECT sum(z) AS s_z, min(z) AS z0, count(*) AS n
        |FROM graft_sql_sum
        |WHERE x >= -200 AND x < 200 AND y >= -200 AND y < 200"""
        .stripMargin)
    out.collect() // force planning for the shape assertion
    val plan = graft.sources.v2.GraftSource.lastAggPlan.get(path)
    require(plan != null && plan._1 > 0,
      s"SUM pushdown served nothing from the manifest: $plan")
    out
  }

  val sqlSumSql: String =
    s"""WITH pts AS ($P)
       |SELECT sum(floor(z)) AS s_z, min(floor(z)) AS z0, count(*) AS n
       |FROM pts
       |WHERE x >= -200 AND x < 200 AND y >= -200 AND y < 200""".stripMargin

  /** 20b: the reference's `make_queue` as queryable metadata —
    * `CALL system.stale_tiles(tbl, since_epoch, tile_size)` answers
    * "which tiles need re-running" from the commit changelog: new
    * rows (epochs > cursor) roll up to their tile and dilate to the
    * 8-neighborhood exactly as `dilate_bins` (edge data invalidates
    * neighbors' crossover products), n_new = 0 marking dilation-only
    * tiles.  Reads ONLY the appended files (changelog prune); output
    * is tile-count-sized.  The oracle computes the same rollup +
    * dilation relationally over the second batch; a changelog cursor
    * off by one epoch, a missed neighbor, or a point counted into
    * the wrong tile hash-mismatches.
    */
  private val staleTilesSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  def staleTilesQ(s: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("staletq").toString
    val path = s"$wh/geo/pts"
    val p = pts(s, dir).select("id", "x", "y", "z")
    graft.sources.GeoParquet.write(p.filter(col("id") % 3 =!= 0), path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)
    val e0 = graft.sources.GeoParquet.readEpoch(s, path)
    graft.sources.GeoParquet.appendWithManifest(
      p.filter(col("id") % 3 === 0), path, 250.0)
    val cat = s"graft_stl${staleTilesSeq.incrementAndGet()}"
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    s.sql(s"CALL $cat.system.stale_tiles('geo.pts', $e0, " +
        "CAST(500.0 AS DOUBLE))")
      .orderBy("tile_e", "tile_n")
  }

  val staleTilesSql: String =
    s"""WITH pts AS ($P),
       |newpts AS (SELECT * FROM pts WHERE id % 3 = 0),
       |base AS (SELECT CAST(floor(x/500.0)*500 AS BIGINT) AS tile_e,
       |                CAST(floor(y/500.0)*500 AS BIGINT) AS tile_n,
       |                count(*) AS n
       |         FROM newpts GROUP BY 1, 2),
       |offs AS (SELECT de.de, dn.dn
       |         FROM (VALUES (-1), (0), (1)) de(de),
       |              (VALUES (-1), (0), (1)) dn(dn)),
       |dil AS (SELECT tile_e + de * 500 AS tile_e,
       |               tile_n + dn * 500 AS tile_n,
       |               CASE WHEN de = 0 AND dn = 0 THEN n ELSE 0 END AS n
       |        FROM base, offs)
       |SELECT tile_e, tile_n, CAST(sum(n) AS BIGINT) AS n_new
       |FROM dil GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** 61z3: the SQL-face WRITE path end to end — the layout starts
    * with the even ids, the odd half arrives through
    * `df.write.format("graft").mode("append")` (which routes into
    * the locked [[graft.sources.GeoParquet.appendWithManifest]]
    * commit), and a pruned SQL box read serves the union.  The
    * oracle is the plain box select over ALL points, so rows lost by
    * the insert path — or a manifest it staled — hash-mismatch.
    */
  def sqlWrite(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("sqlwriteq").toString
    val p = pts(s, dir).select("id", "x", "y", "z")
    graft.sources.GeoParquet.write(p.filter(col("id") % 2 === 0), path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)
    p.filter(col("id") % 2 === 1)
      .write.format("graft").mode("append").save(path)
    s.read.format("graft").load(path).createOrReplaceTempView("graft_sql_write")
    s.sql("""SELECT id, x, y, z FROM graft_sql_write
            |WHERE x >= -300 AND x < 300 AND y >= -300 AND y < 300
            |ORDER BY id""".stripMargin)
  }

  val sqlWriteSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y, z FROM pts
       |WHERE x >= -300 AND x < 300 AND y >= -300 AND y < 300
       |ORDER BY id""".stripMargin

  /** 61z4: time travel through the SQL face — the layout grows by an
    * appendWithManifest commit, then `.option("snapshot", 0)` pins
    * the read to the BASE commit from plain SQL (the queryBoxAsOf
    * axis, `q_snapshot_box`'s twin).  The oracle is the even-id box
    * select: a snapshot that leaks the appended half — or loses base
    * files — hash-mismatches.
    */
  def sqlAsOf(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("sqlasof").toString
    val p = pts(s, dir).select("id", "x", "y", "z")
    graft.sources.GeoParquet.write(p.filter(col("id") % 2 === 0), path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)
    graft.sources.GeoParquet.appendWithManifest(
      p.filter(col("id") % 2 === 1), path, 250.0)
    s.read.format("graft").option("snapshot", "0").load(path)
      .createOrReplaceTempView("graft_sql_asof")
    s.sql("""SELECT id, x, y, z FROM graft_sql_asof
            |WHERE x >= -230 AND x < 480 AND y >= -470 AND y < 230
            |ORDER BY id""".stripMargin)
  }

  val sqlAsOfSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y, z FROM pts
       |WHERE x >= -230 AND x < 480 AND y >= -470 AND y < 230
       |  AND id % 2 = 0
       |ORDER BY id""".stripMargin

  /** 61z20: time travel by WALL CLOCK through the SQL face —
    * `TIMESTAMP AS OF` (the form schedulers actually write: "the
    * table as of last night", no epoch numbers) resolves through the
    * `_epoch_times` commit stamps to the base commit's epoch
    * ([[graft.sources.GeoParquet.epochAtTime]]) and pins it exactly
    * as `VERSION AS OF` would.  Same oracle as [[sqlAsOf]]: a
    * resolution that leaks the appended half — or misses base
    * files — hash-mismatches.
    */
  def sqlTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("sqlts").toString
    val path = s"$wh/geo/tt"
    val p = pts(s, dir).select("id", "x", "y", "z")
    graft.sources.GeoParquet.write(p.filter(col("id") % 2 === 0), path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)
    // race-free AS-OF pin: the pin IS the base commit's recorded
    // `_epoch_times` stamp, and the append is held until the clock
    // has strictly passed it — so the append's stamp is strictly
    // later and `epochAtTime(t0)` resolves to epoch 0 by
    // construction (no wall-clock sleeps whose granularity or an
    // NTP step could collapse the two stamps onto the pin)
    val t0 = graft.sources.GeoParquet.epochTimes(s, path)
      .filter(_._1 == 0L).map(_._2).max
    while (System.currentTimeMillis() <= t0) Thread.sleep(1)
    graft.sources.GeoParquet.appendWithManifest(
      p.filter(col("id") % 2 === 1), path, 250.0)
    val mid = t0
    s.conf.set("spark.sql.catalog.graft_tt",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_tt.warehouse", wh)
    s.sql(s"""SELECT id, x, y, z
             |FROM graft_tt.geo.tt TIMESTAMP AS OF timestamp_millis(${mid}L)
             |WHERE x >= -230 AND x < 480 AND y >= -470 AND y < 230
             |ORDER BY id""".stripMargin)
  }

  val sqlTimeTravelSql: String = sqlAsOfSql

  /** 61z26: the CDC point/band lookup through the SQL face — a
    * key-clustered layout records which data column its cluster key
    * mirrors (`_keycol`), so a STRING key predicate (residual for the
    * exact evaluator) still reaches the manifest as a [k0,k1] range
    * and the canonical "fetch these keys" query opens only the files
    * whose key run can contain them.  The in-query plan assertion
    * pins pruned < total; the oracle is the plain band select.
    */
  def sqlKeyProbe(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("sqlkeyq").toString
    val p = pts(s, dir).select(
      concat(lit("K"), lpad(col("id").cast("string"), 8, "0")).as("sid"),
      col("z"))
    graft.sources.GeoParquet.writeKeyed(p, path, "sid", nFiles = 16)
    s.read.format("graft").load(path).createOrReplaceTempView("graft_sql_key")
    val out = s.sql("""SELECT sid, z FROM graft_sql_key
        |WHERE sid >= 'K00000100' AND sid < 'K00000400'
        |ORDER BY sid""".stripMargin)
    out.collect() // force planning for the shape assertion
    val planned =
      graft.sources.v2.GraftSource.lastPlannedFiles.get(path).size
    val total = s.read.parquet(s"$path/_manifest").count()
    require(planned < total,
      s"key-range probe planned $planned of $total files — the " +
        "manifest [k0,k1] prune did not fire")
    out
  }

  val sqlKeyProbeSql: String =
    s"""WITH pts AS ($P)
       |SELECT 'K' || lpad(CAST(id AS VARCHAR), 8, '0') AS sid, z
       |FROM pts
       |WHERE id >= 100 AND id < 400
       |ORDER BY sid""".stripMargin

  /** 61z33: LIMIT pushdown as a file-plan budget — the preview query.
    * `LIMIT n` with exactly-pushed filters plans only enough
    * manifest-CERTIFIED all-matching files to cover n rows (the
    * aggregate pushdown's containment certificate re-used as a yield
    * proof); at 100 TB, "show me 500 rows" stops planning at ~one
    * file instead of the whole matching set.  Which 500 rows come
    * back is inherently nondeterministic, so the gate pins the
    * DETERMINISTIC part — the count, the filter honored on every
    * returned row, and the plan truncation — and the oracle pins the
    * count.
    */
  def sqlLimit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = java.nio.file.Files.createTempDirectory("sqllimq").toString
    graft.sources.GeoParquet.writeKeyed(
      pts(s, dir).select("id", "x", "y", "z"), path, "id", nFiles = 16)
    s.read.format("graft").load(path).createOrReplaceTempView("graft_sql_lim")
    val preview = s.sql(
      """SELECT id, z FROM graft_sql_lim
        |WHERE id >= 100 AND id < 60000 LIMIT 500""".stripMargin).collect()
    require(preview.length == 500 && preview.forall { r =>
        val v = r.getLong(0); v >= 100 && v < 60000 },
      s"preview returned ${preview.length} rows or violated its filter")
    val planned =
      graft.sources.v2.GraftSource.lastPlannedFiles.get(path).size
    val total = s.read.parquet(s"$path/_manifest").count()
    require(planned < total,
      s"LIMIT preview planned $planned of $total files — the " +
        "file-plan truncation did not fire")
    Seq(preview.length.toLong).toDF("n")
  }

  val sqlLimitSql: String = "SELECT (500::BIGINT) AS n"

  /** 61z34: Top-N pushdown — the ordered export head.  `ORDER BY <the
    * cluster key> LIMIT n` on a keyed layout plans only the
    * key-ordered head of the file set (budget from manifest-contained
    * files, closure over every file whose range reaches the
    * threshold), so "first/latest n by key" over a 100 TB CDC table
    * stops planning after ~one file.  Unlike the bare-LIMIT preview
    * this output is fully DETERMINISTIC, so the oracle pins the exact
    * rows: a dropped file that held a top-n key, a truncation that
    * broke the order, or a boundary row lost to the closure all
    * hash-mismatch.  The plan truncation itself is asserted in-query.
    */
  def sqlTopk(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("sqltopkq").toString
    graft.sources.GeoParquet.writeKeyed(
      pts(s, dir).select("id", "x", "y", "z"), path, "id", nFiles = 16)
    s.read.format("graft").load(path)
      .createOrReplaceTempView("graft_sql_topk")
    val out = s.sql(
      """SELECT id, z FROM graft_sql_topk
        |WHERE id >= 100 ORDER BY id LIMIT 500""".stripMargin)
    out.collect() // force planning for the truncation assertion
    val planned =
      graft.sources.v2.GraftSource.lastPlannedFiles.get(path).size
    val total = s.read.parquet(s"$path/_manifest").count()
    require(planned < total,
      s"key-ordered top-k planned $planned of $total files — the " +
        "TopN file-plan truncation did not fire")
    out
  }

  val sqlTopkSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, z FROM pts
       |WHERE id >= 100 ORDER BY id LIMIT 500""".stripMargin

  /** 61z38: COMPOSITE-key Top-N pushdown — `ORDER BY tenant, id LIMIT
    * n` on a (tenant, id)-clustered CDC table plans only the
    * key-ordered head of the file set, through the struct [k0,k1]
    * stats (a lexicographic extremum has an extremal prefix, so the
    * endpoints' leading fields bound any leading-prefix order; struct
    * min/max order null fields first exactly as Spark's default
    * multi-column sort, so nulls stay inside the proven bounds).
    * "First n rows by tenant" over a 100 TB multi-tenant table stops
    * planning at ~one file.  The full-key order makes the result
    * DETERMINISTIC, so the oracle hash-pins the exact rows; the
    * in-query assertion pins the plan budget.
    */
  def sqlTopk2(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("sqltopk2").toString
    graft.sources.GeoParquet.writeKeyed(
      pts(s, dir).select((col("id") % 10).as("tenant"), col("id"), col("z")),
      path, Seq("tenant", "id"), nFiles = 16)
    s.read.format("graft").load(path)
      .createOrReplaceTempView("graft_sql_topk2")
    val out = s.sql(
      """SELECT tenant, id, z FROM graft_sql_topk2
        |ORDER BY tenant, id LIMIT 500""".stripMargin)
    out.collect() // force planning for the truncation assertion
    val planned =
      graft.sources.v2.GraftSource.lastPlannedFiles.get(path).size
    val total = s.read.parquet(s"$path/_manifest").count()
    require(planned < total,
      s"composite-key top-k planned $planned of $total files — the " +
        "struct-stats TopN truncation did not fire")
    out
  }

  val sqlTopk2Sql: String =
    s"""WITH pts AS ($P)
       |SELECT id % 10 AS tenant, id, z FROM pts
       |ORDER BY tenant, id LIMIT 500""".stripMargin

  private val spjSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  // bench loops re-run gate queries many times in one session: the
  // bucketed layouts these two gates probe are pure functions of the
  // sf dir, so build them ONCE per dir instead of writing a fresh
  // temp warehouse per invocation (unbounded temp-dir growth + write
  // cost folded into read timings, the r15 advice note)
  private val spjWarehouses =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val bucketProbeLayouts =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** 61z35: storage-partitioned join.  Two graft tables hash-bucketed
    * the same way (bucket id = pmod(murmur3(key), n) — the write
    * shuffle's own partition index, certified by the part-file names)
    * join on the key with ZERO shuffle: each scan reports a
    * `bucket(n, key)` KeyGroupedPartitioning, Spark resolves the
    * transform through the catalog's v2 `bucket` function, proves the
    * sides co-partitioned, and zips the joins bucket by bucket.  At
    * 100 TB this moves co-location out of every job (a full-corpus
    * shuffle per fact-fact join) into the layout, paid once at write
    * — the Iceberg/Hive-bucketing contract on graft layouts.  The
    * in-query assertion pins the plan: zero ShuffleExchange nodes
    * under the collected join.  The oracle joins the same slices
    * relationally; a dropped bucket, a mis-grouped partition, or a
    * row hashed into the wrong bucket hash-mismatches.
    */
  def sqlSpj(s: SparkSession, dir: String): DataFrame = {
    val wh = spjWarehouses.computeIfAbsent(dir, _ => {
      val w = java.nio.file.Files.createTempDirectory("sqlspj").toString
      val p = pts(s, dir).select("id", "z")
      graft.sources.GeoParquet.writeBucketed(p, s"$w/geo/ta", "id", 8)
      graft.sources.GeoParquet.writeBucketed(
        p.filter(col("id") % 3 === 0).withColumn("z", col("z") * 2.0),
        s"$w/geo/tb", "id", 8)
      w
    })
    val cat = s"graft_spj${spjSeq.incrementAndGet()}"
    // a CLONED session owns the conf flips: Verify runs queries
    // concurrently on the shared session, so a global set/restore of
    // bucketing (or broadcast thresholds) could flake another query
    // planned inside the window — the clone shares the SparkContext
    // and nothing else, and dies with this call.  The MERGE hint
    // rules out a broadcast (which would also avoid shuffles without
    // exercising the partitioned join) query-locally on top.
    val s2 = s.newSession()
    s2.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    s2.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val out = s2.sql(
      s"""SELECT /*+ MERGE(a) */ a.id, a.z AS za, b.z AS zb
         |FROM $cat.geo.ta a JOIN $cat.geo.tb b ON a.id = b.id"""
        .stripMargin)
    out.collect() // force execution for the plan assertion
    // STAGE-AWARE count (graft.core.PlanWalk): after collect() the
    // AQE plan is result stages whose interiors a naive collect
    // never visits — a plain traversal would read 0 for ANY join
    // and pin nothing
    val nShuffles = graft.core.PlanWalk.shuffles(
      out.queryExecution.executedPlan)
    require(nShuffles == 0,
      s"expected a storage-partitioned join with zero shuffles, " +
        s"saw $nShuffles:\n${out.queryExecution.executedPlan}")
    out
  }

  val sqlSpjSql: String =
    s"""WITH pts AS ($P),
       |ta AS (SELECT id, z FROM pts),
       |tb AS (SELECT id, z * 2.0 AS z FROM pts WHERE id % 3 = 0)
       |SELECT a.id, a.z AS za, b.z AS zb
       |FROM ta a JOIN tb b ON a.id = b.id""".stripMargin

  /** 61z36: hash-bucket point-lookup pruning.  On a bucketed layout an
    * equality/IN predicate on the bucket key opens only the named
    * buckets' files — and unlike the range-keyed [k0,k1] prune, the
    * selectivity NEVER erodes with appends (every commit's files hash
    * into the same n buckets; a range layout's appended files overlap
    * old ranges until compaction).  The layout here takes two commits
    * before the probe, and the assertion budgets the plan at bucket
    * granularity across both.  The oracle evaluates the same IN over
    * the unioned batches; a mis-hashed literal (wrong type widening)
    * or an over-pruned file would drop rows and hash-mismatch.
    */
  def bucketProbe(s: SparkSession, dir: String): DataFrame = {
    val path = bucketProbeLayouts.computeIfAbsent(dir, _ => {
      val w = java.nio.file.Files.createTempDirectory("bktprobe").toString
      val p = pts(s, dir).select("id", "x", "y", "z")
      graft.sources.GeoParquet.writeBucketed(p, w, "id", 16)
      graft.sources.GeoParquet.appendCurve(
        p.withColumn("id", col("id") + 10000000L), w, 1.0)
      w
    })
    s.read.format("graft").load(path)
      .createOrReplaceTempView("graft_bucket_probe")
    val out = s.sql(
      """SELECT id, z FROM graft_bucket_probe
        |WHERE id IN (11, 4242, 10000011) ORDER BY id""".stripMargin)
    out.collect() // force planning for the prune assertion
    val planned =
      graft.sources.v2.GraftSource.lastPlannedFiles.get(path).size
    val bucketOf = s.read.parquet(s"$path/_manifest")
      .select("file").collect()
      .map(r => graft.sources.GeoParquet.bucketOfFileName(r.getString(0)))
    val total = bucketOf.length
    // the bound derives from the layout's ACTUAL occupancy, not a
    // fixed ratio (which flakes at small sf where empty buckets
    // shrink the manifest): 3 probed keys touch at most 3 buckets,
    // each holding at most maxPerBucket files — that product is the
    // exact certificate a firing prune can never exceed
    val maxPerBucket = bucketOf.flatten
      .groupBy(identity).values.map(_.size).foldLeft(1)(_ max _)
    require(planned > 0 && planned <= 3 * maxPerBucket,
      s"bucket point probe planned $planned of $total files " +
        s"(max $maxPerBucket files/bucket) — the bucket prune did " +
        "not fire (3 keys x 2 commits)")
    out
  }

  val bucketProbeSql: String =
    s"""WITH pts AS ($P),
       |all_rows AS (SELECT id, z FROM pts
       |             UNION ALL SELECT id + 10000000, z FROM pts)
       |SELECT id, z FROM all_rows
       |WHERE id IN (11, 4242, 10000011) ORDER BY id""".stripMargin

  private val ddlKeySeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** 61z32: the pure-SQL keyed CDC lifecycle — `CREATE TABLE …
    * TBLPROPERTIES('key'='tenant,id')` declares a composite
    * cluster key with NO spatial geometry anywhere, INSERTs cluster
    * their batches on the mirrored key, UPDATE mutates through the
    * SQL row-level path (its delta commit routes through the keyed
    * append, so re-inserted rows keep the key mirror and the
    * manifest's struct [k0,k1] stay data-key ranges), and tenant
    * point probes are answered from a sliver of the files (the
    * leading-prefix composite prune, asserted in-query on BOTH
    * probes).  No API call anywhere: creation, ingest, mutation, and
    * lookup all from SQL — the full CDC table shape a 100 TB
    * deployment drives from a scheduler.  The oracle applies the
    * same mutation relationally; a dropped re-insert, a key-pruned
    * file that held matching rows, or a resurrected pre-UPDATE copy
    * hash-mismatches.  Unique catalog per invocation: a catalog pins
    * its warehouse at first use (see [[sqlMorCount]]).
    */
  def sqlDdlKey(s: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("sqlddlk").toString
    val cat = s"graft_ddlk${ddlKeySeq.incrementAndGet()}"
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    s.sql(s"""CREATE TABLE $cat.geo.cdc (tenant BIGINT, id BIGINT, z DOUBLE)
             |TBLPROPERTIES('key'='tenant,id')""".stripMargin)
    pts(s, dir).select((col("id") % 10).as("tenant"), col("id"), col("z"))
      .createOrReplaceTempView("graft_ddl_src")
    // two key-disjoint ingest batches = two files with disjoint
    // leading-key ranges, so a tenant probe has something to prune
    s.sql(s"INSERT INTO $cat.geo.cdc " +
      "SELECT tenant, id, z FROM graft_ddl_src WHERE tenant < 5")
    s.sql(s"INSERT INTO $cat.geo.cdc " +
      "SELECT tenant, id, z FROM graft_ddl_src WHERE tenant >= 5")
    s.sql(s"UPDATE $cat.geo.cdc SET z = z + 1000000.0 " +
      "WHERE tenant = 7 AND id < 50000")
    val path = s"$wh/geo/cdc"
    def probe(t: Int): DataFrame = {
      val out = s.sql(
        s"SELECT tenant, id, z FROM $cat.geo.cdc WHERE tenant = $t")
      out.collect() // force planning for the prune assertion
      val planned =
        graft.sources.v2.GraftSource.lastPlannedFiles.get(path).size
      val total = s.read.parquet(s"$path/_manifest").count()
      require(planned < total,
        s"tenant=$t probe planned $planned of $total files — the " +
          "composite-key manifest prune did not fire on the DDL table")
      out
    }
    // tenant 2: untouched band (prunes to the first ingest file);
    // tenant 7: the mutated band (prunes to the second + the
    // UPDATE's re-inserts, and must see post-UPDATE values only)
    probe(2).unionAll(probe(7)).orderBy("tenant", "id")
  }

  /** 61z39: the pure-SQL SPATIAL lifecycle — `CREATE TABLE …
    * TBLPROPERTIES('delta'='250.0','curve'='z')` declares a
    * curve-clustered layout with no API call, INSERTs dispatch
    * through appendCurve (each batch key-sorted, its [k0,k1] ranges
    * manifested from the first commit), and a box probe is answered
    * through the BIGMIN curve-range decomposition from a sliver of
    * the files (asserted in-query).  Together with 61z32 ('key') and
    * 61z35 ('buckets'), every layout geometry the engine writes is
    * now DDL-creatable — a 100 TB deployment's scheduler needs no
    * Scala anywhere in the create→ingest→query→maintain loop.  The
    * oracle replays the box relationally; a mis-keyed INSERT batch, a
    * curve range that drops a boundary cell, or an over-pruned file
    * hash-mismatches.
    */
  private val ddlCurveSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  def sqlDdlCurve(s: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("sqlddlc").toString
    val cat = s"graft_ddlc${ddlCurveSeq.incrementAndGet()}"
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    s.sql(s"""CREATE TABLE $cat.geo.curved (id BIGINT, x DOUBLE,
             |y DOUBLE, z DOUBLE)
             |USING graft
             |TBLPROPERTIES('delta'='250.0', 'curve'='z',
             |'files'='8')""".stripMargin)
    pts(s, dir).select("id", "x", "y", "z")
      .createOrReplaceTempView("graft_ddl_curve_src")
    // 'files'='8': each INSERT range-splits into 8 key-sorted files
    // (the parallel-ingest shape), so the box probe has a real file
    // population to prune across both commits
    Seq("x < 0", "x >= 0").foreach { w =>
      s.sql(s"INSERT INTO $cat.geo.curved " +
        s"SELECT id, x, y, z FROM graft_ddl_curve_src WHERE $w")
    }
    val path = s"$wh/geo/curved"
    val out = s.sql(
      s"""SELECT id, x, y, z FROM $cat.geo.curved
         |WHERE x >= 500 AND x < 900 AND y >= 500 AND y < 900
         |ORDER BY id""".stripMargin)
    out.collect() // force planning for the prune assertion
    val planned =
      graft.sources.v2.GraftSource.lastPlannedFiles.get(path).size
    val total = s.read.parquet(s"$path/_manifest").count()
    require(planned > 0 && planned < total,
      s"DDL curve probe planned $planned of $total files — the curve " +
        "prune did not fire on the SQL-created layout")
    out
  }

  val sqlDdlCurveSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y, z FROM pts
       |WHERE x >= 500 AND x < 900 AND y >= 500 AND y < 900
       |ORDER BY id""".stripMargin

  val sqlDdlKeySql: String =
    s"""WITH pts AS ($P),
       |t AS (SELECT id % 10 AS tenant, id, z FROM pts)
       |SELECT tenant, id,
       |       CASE WHEN tenant = 7 AND id < 50000
       |            THEN z + (1000000.0::DOUBLE) ELSE z END AS z
       |FROM t WHERE tenant IN (2, 7)
       |ORDER BY tenant, id""".stripMargin

  /** 61z5: named-table SQL through the catalog plugin
    * ([[graft.sources.v2.GraftCatalog]]) — the layout lands under a
    * warehouse, the catalog maps `<cat>.<ns>.<tbl>` onto it, and the
    * box query runs by NAME with the SQL face's pruning.  The oracle
    * is the plain box select; resolution errors or a catalog that
    * opened the wrong directory hash-mismatch.
    */
  def sqlCatalog(s: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("sqlcat").toString
    graft.sources.GeoParquet.write(
      pts(s, dir).select("id", "x", "y", "z"), s"$wh/geo/points", 250.0)
    graft.sources.GeoParquet.writeManifest(s, s"$wh/geo/points")
    s.conf.set("spark.sql.catalog.graft_gate",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_gate.warehouse", wh)
    s.sql("""SELECT id, x, y, z FROM graft_gate.geo.points
            |WHERE x >= -400 AND x < 400 AND y >= -400 AND y < 400
            |ORDER BY id""".stripMargin)
  }

  val sqlCatalogSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y, z FROM pts
       |WHERE x >= -400 AND x < 400 AND y >= -400 AND y < 400
       |ORDER BY id""".stripMargin

  /** 61z7: runtime (join-driven) file pruning — a selective
    * broadcast-dim join over the SQL face, where Spark's dynamic
    * pruning hands the dim's surviving keys to the scan
    * ([[graft.sources.v2.GraftScan]].filter) and planning probes the
    * manifest's membership filters: only might-contain files open.
    * Pruning is files-only (the join re-checks rows), so the oracle —
    * the equivalent two-table join — hash-matches whether or not the
    * dynamic filter fires; the firing itself is pinned in
    * SqlFaceSpec.
    */
  def sqlDimJoin(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("sqldpp").toString
    val p = pts(s, dir).select("id", "x", "y", "z")
    graft.sources.GeoParquet.write(p, path, 250.0)
    graft.sources.GeoParquet.declareFilterCols(s, path, Seq("id"))
    graft.sources.GeoParquet.writeManifest(s, path)
    val dimDir = java.nio.file.Files.createTempDirectory("sqldppdim").toString
    p.select(col("id")).filter(col("id") % 499 === 0)
      .withColumn("pick", (col("id") % 998 === 0).cast("int"))
      .write.mode("overwrite").parquet(dimDir)
    s.read.parquet(dimDir).createOrReplaceTempView("graft_sql_dim")
    s.read.format("graft").load(path).createOrReplaceTempView("graft_sql_fact")
    s.sql("""SELECT f.id, f.x, f.y, f.z
            |FROM graft_sql_fact f JOIN graft_sql_dim d ON f.id = d.id
            |WHERE d.pick = 1
            |ORDER BY f.id""".stripMargin)
  }

  val sqlDimJoinSql: String =
    s"""WITH pts AS ($P),
       |dim AS (SELECT id, CASE WHEN id % 998 = 0 THEN 1 ELSE 0 END AS pick
       |        FROM pts WHERE id % 499 = 0)
       |SELECT p.id, p.x, p.y, p.z
       |FROM pts p JOIN dim d ON p.id = d.id
       |WHERE d.pick = 1
       |ORDER BY p.id""".stripMargin

  /** 61z13: SQL UPDATE through the delta rewrite, end to end — a
    * layout of the table's points, `UPDATE … WHERE id % 7 = 0` via
    * plain `spark.sql` (a condition the metadata-delete path cannot
    * translate, so the row-level rewrite runs: row-address scan →
    * executor-staged deltas → locked positional-tombstone + append
    * commit), `CALL system.compact` to reclaim, then a box read back
    * through the SQL face.  The oracle is the update as a CASE over
    * the base table: a double-applied update, a resurrected old
    * copy, or a lost untouched row all hash-mismatch.
    */
  def sqlUpdate(s: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("sqlupd").toString
    graft.sources.GeoParquet.write(
      pts(s, dir).select("id", "x", "y", "z"), s"$wh/geo/points", 250.0)
    graft.sources.GeoParquet.writeManifest(s, s"$wh/geo/points")
    s.conf.set("spark.sql.catalog.graft_mut",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mut.warehouse", wh)
    s.sql("UPDATE graft_mut.geo.points SET z = z + 1000000.0 WHERE id % 7 = 0")
    s.sql("CALL graft_mut.system.compact('geo.points')").collect()
    s.sql("""SELECT id, x, y, z FROM graft_mut.geo.points
            |WHERE x >= -400 AND x < 400 AND y >= -400 AND y < 400
            |ORDER BY id""".stripMargin)
  }

  val sqlUpdateSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y,
       |       CASE WHEN id % 7 = 0 THEN z + (1000000.0::DOUBLE) ELSE z END AS z
       |FROM pts
       |WHERE x >= -400 AND x < 400 AND y >= -400 AND y < 400
       |ORDER BY id""".stripMargin

  /** 61z14: merge-on-read SQL — UPDATE then DELETE and read back with
    * NO compaction anywhere: the SQL scan itself subtracts the
    * pending positional tombstones (readers point-look-up their own
    * file's doomed rows from the sidecar), and the DELETE's row-level
    * scan already subtracts the UPDATE's — chained mutations compose.
    * The oracle applies both mutations relationally; a resurrected
    * old copy, a leaked doomed row, or a lost survivor
    * hash-mismatches.
    */
  def sqlMor(s: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("sqlmor").toString
    graft.sources.GeoParquet.write(
      pts(s, dir).select("id", "x", "y", "z"), s"$wh/geo/points", 250.0)
    graft.sources.GeoParquet.writeManifest(s, s"$wh/geo/points")
    s.conf.set("spark.sql.catalog.graft_mor",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mor.warehouse", wh)
    s.sql("UPDATE graft_mor.geo.points SET z = z + 1000000.0 WHERE id % 7 = 0")
    s.sql("DELETE FROM graft_mor.geo.points WHERE id % 11 = 3")
    s.sql("""SELECT id, x, y, z FROM graft_mor.geo.points
            |WHERE x >= -400 AND x < 400 AND y >= -400 AND y < 400
            |ORDER BY id""".stripMargin)
  }

  val sqlMorSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y,
       |       CASE WHEN id % 7 = 0 THEN z + (1000000.0::DOUBLE) ELSE z END AS z
       |FROM pts
       |WHERE id % 11 <> 3
       |  AND x >= -400 AND x < 400 AND y >= -400 AND y < 400
       |ORDER BY id""".stripMargin

  /** 61z17: time travel COMPOSES with pending merge-on-read deletes —
    * the layout takes an UPDATE (delete+insert, epoch 2) and a DELETE
    * (epoch 3) with NOTHING compacted, then reads back `VERSION AS
    * OF` every mutation boundary in one query.  Positional tombstone
    * parts carry their commit epoch in the adopted part name, so the
    * epoch-1 read serves rows that are ALREADY DEAD in the present
    * (its snapshot predates both mutations), epoch 2 sees the update
    * but not the delete, epoch 3 sees both — the Iceberg
    * sequence-number contract, previously a refusal.  The oracle
    * replays each era relationally; a snapshot that leaks a later
    * delete — or subtracts one too early — hash-mismatches.
    */
  def sqlAsOfMor(s: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("sqlamor").toString
    val p = pts(s, dir).select("id", "x", "y", "z")
    graft.sources.GeoParquet.write(
      p.filter(col("id") % 2 === 0), s"$wh/geo/points", 250.0)
    graft.sources.GeoParquet.writeManifest(s, s"$wh/geo/points")     // epoch 0
    graft.sources.GeoParquet.appendWithManifest(
      p.filter(col("id") % 2 === 1), s"$wh/geo/points", 250.0)      // epoch 1
    s.conf.set("spark.sql.catalog.graft_amor",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_amor.warehouse", wh)
    s.sql("UPDATE graft_amor.geo.points SET z = z + 1000000.0 WHERE id % 7 = 0") // 2
    s.sql("DELETE FROM graft_amor.geo.points WHERE id % 11 = 3")                 // 3
    s.sql("""SELECT 1 AS era, id, x, y, z
            |FROM graft_amor.geo.points VERSION AS OF 1
            |WHERE x >= -400 AND x < 400 AND y >= -400 AND y < 400
            |UNION ALL
            |SELECT 2 AS era, id, x, y, z
            |FROM graft_amor.geo.points VERSION AS OF 2
            |WHERE x >= -400 AND x < 400 AND y >= -400 AND y < 400
            |UNION ALL
            |SELECT 3 AS era, id, x, y, z
            |FROM graft_amor.geo.points VERSION AS OF 3
            |WHERE x >= -400 AND x < 400 AND y >= -400 AND y < 400
            |ORDER BY era, id""".stripMargin)
  }

  val sqlAsOfMorSql: String =
    s"""WITH pts AS ($P),
       |upd AS (SELECT id, x, y,
       |               CASE WHEN id % 7 = 0 THEN z + (1000000.0::DOUBLE)
       |                    ELSE z END AS z
       |        FROM pts)
       |SELECT 1 AS era, id, x, y, z FROM pts
       |WHERE x >= -400 AND x < 400 AND y >= -400 AND y < 400
       |UNION ALL
       |SELECT 2 AS era, id, x, y, z FROM upd
       |WHERE x >= -400 AND x < 400 AND y >= -400 AND y < 400
       |UNION ALL
       |SELECT 3 AS era, id, x, y, z FROM upd
       |WHERE id % 11 <> 3
       |  AND x >= -400 AND x < 400 AND y >= -400 AND y < 400
       |ORDER BY era, id""".stripMargin

  val countBoxSql: String =
    s"""WITH pts AS ($P)
       |SELECT count(*) AS n FROM pts
       |WHERE x >= -200 AND x < 200 AND y >= -200 AND y < 200""".stripMargin

  /** 61z19: MOR-aware COUNT pushdown — counts stay manifest-answered
    * UNDER pending merge-on-read deletes: the planner subtracts each
    * contained file's doomed-position count from its manifest stats
    * (interior files never open; one tiny (file,n) agg over the
    * tombstone parts) and boundary scans skip doomed positions.
    * Previously any pending delete degraded every aggregate to the
    * full subtracting row scan.  The query ASSERTS the plan shape
    * (manifest-answered files > 0 while deletes are pending) and the
    * oracle pins the value — a count that misses a subtraction, or
    * double-subtracts, hash-mismatches.
    */
  private val morCountSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  def sqlMorCount(s: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("sqlmrc").toString
    val path = s"$wh/geo/points"
    graft.sources.GeoParquet.write(
      pts(s, dir).select("id", "x", "y", "z"), path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)
    // unique catalog name per invocation: a catalog instance pins its
    // warehouse at first use, and this query's plan assertion must
    // look at THIS run's layout (the bench warmup runs every query
    // twice in one session)
    val cat = s"graft_mrc${morCountSeq.incrementAndGet()}"
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    s.sql(s"UPDATE $cat.geo.points SET z = z + 1000000.0 WHERE id % 7 = 0")
    s.sql(s"DELETE FROM $cat.geo.points WHERE id % 11 = 3")
    val df = s.sql(
      s"""SELECT count(*) AS n, count(z) AS n_z FROM $cat.geo.points
        |WHERE x >= -10000000.0 AND x < 10000000.0
        |  AND y >= -10000000.0 AND y < 10000000.0""".stripMargin)
    df.collect() // force planning + execution for the shape assertions
    require(graft.sources.GeoParquet.pendingPositional(s, path).nonEmpty,
      "gate setup broken: the deletes were unexpectedly compacted away")
    val plan = graft.sources.v2.GraftSource.lastAggPlan.get(path)
    require(plan != null && plan._1 > 0,
      s"MOR count pushdown did not serve files from the manifest: $plan")
    df
  }

  val sqlMorCountSql: String =
    s"""WITH pts AS ($P)
       |SELECT count(*) AS n, count(z) AS n_z FROM pts
       |WHERE id % 11 <> 3
       |  AND x >= -10000000.0 AND x < 10000000.0
       |  AND y >= -10000000.0 AND y < 10000000.0""".stripMargin

  /** 61z37: MOR-aware MIN/MAX aggregate pushdown — the last read-path
    * cost cliff under pending deletes.  Previously ANY pending
    * positional delete degraded every MIN/MAX to a scanning read of
    * all pruned files, even though the tombstone parts NAME the doomed
    * files.  Now a file with ZERO doomed positions serves z0/z1 from
    * the manifest unopened and only doomed files boundary-scan (with
    * their dead positions skipped) — at 100 TB a dashboard MIN after
    * one row's DELETE stops paying a corpus-wide scan until
    * compaction.  The gate mutates ONE spatial band (x >= 900) and
    * asserts the disjoint box's MIN/MAX/COUNT plan opened ZERO files
    * while deletes are pending; the second probe aggregates the
    * mutated band itself, so a leaked doomed extremum (the deleted
    * rows carry the corpus' +1e6 outliers), a missed re-insert, or a
    * double subtraction hash-mismatches against the relational
    * oracle.
    */
  private val morMinMaxSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  def sqlMorMinMax(s: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("sqlmmx").toString
    val path = s"$wh/geo/points"
    graft.sources.GeoParquet.write(
      pts(s, dir).select("id", "x", "y", "z"), path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)
    val cat = s"graft_mmx${morMinMaxSeq.incrementAndGet()}"
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    // LOCALIZED mutations: only the x >= 900 band's files take
    // tombstones (the UPDATE's re-inserts also land in that band's
    // bins), so every file of the disjoint probe box stays innocent
    s.sql(s"UPDATE $cat.geo.points SET z = z + 1000000.0 " +
      "WHERE id % 7 = 0 AND x >= 900.0")
    s.sql(s"DELETE FROM $cat.geo.points WHERE id % 11 = 3 AND x >= 900.0")
    // probe 1: a box of WHOLE bins, its bounds strictly between the
    // data's 0.5-lattice points AND the 250-bin edges (±375 is an
    // attainable coordinate whose bin envelope TOUCHES the box; a
    // quarter-step inside, every candidate file is fully contained)
    // and disjoint from the mutated band — MIN, MAX and COUNT all
    // answered from the manifest with zero files opened
    val inner = s.sql(
      s"""SELECT 1 AS probe, min(z) AS z0, max(z) AS z1, count(*) AS n
         |FROM $cat.geo.points
         |WHERE x >= -374.75 AND x < 374.75
         |  AND y >= -374.75 AND y < 374.75""".stripMargin)
    inner.collect() // force planning + execution for the shape assertions
    require(graft.sources.GeoParquet.pendingPositional(s, path).nonEmpty,
      "gate setup broken: the deletes were unexpectedly compacted away")
    val plan = graft.sources.v2.GraftSource.lastAggPlan.get(path)
    require(plan != null && plan._1 > 0 && plan._2 == 0,
      s"MOR min/max pushdown opened files for a delete-disjoint box " +
        s"(answered, scanned) = $plan — innocence is provable from the " +
        "tombstone parts' file names and must cost zero opens")
    // probe 2: the mutated band — its doomed files boundary-scan with
    // the dead positions skipped; the +1e6 updates dominate max(z)
    // and the deletes must not resurrect
    val band = s.sql(
      s"""SELECT 2 AS probe, min(z) AS z0, max(z) AS z1, count(*) AS n
         |FROM $cat.geo.points WHERE x >= 900.0""".stripMargin)
    inner.unionAll(band).orderBy("probe")
  }

  val sqlMorMinMaxSql: String =
    s"""WITH pts AS ($P),
       |upd AS (SELECT id, x, y,
       |               CASE WHEN id % 7 = 0 AND x >= 900.0
       |                    THEN z + (1000000.0::DOUBLE) ELSE z END AS z
       |        FROM pts WHERE NOT (id % 11 = 3 AND x >= 900.0))
       |SELECT 1 AS probe, min(z) AS z0, max(z) AS z1, count(*) AS n
       |FROM upd
       |WHERE x >= -374.75 AND x < 374.75 AND y >= -374.75 AND y < 374.75
       |UNION ALL
       |SELECT 2 AS probe, min(z) AS z0, max(z) AS z1, count(*) AS n
       |FROM upd WHERE x >= 900.0
       |ORDER BY probe""".stripMargin

  private val streamGateSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Streaming read of a graft layout, end to end: the layout grows
    * by three commits (a base write + two incremental appends — the
    * epochs ARE the changelog), then
    * `spark.readStream.format("graft")` consumes it through the DSv2
    * micro-batch source ([[graft.sources.v2.GraftMicroBatchStream]])
    * into a streaming aggregation.  The oracle is the same aggregate
    * over the same rows computed relationally: a micro-batch that
    * re-delivers a commit, drops one, or tears a file hash-
    * mismatches.  (Offsets are commit epochs; planning touches the
    * manifest only — one epoch-range filter per batch.)
    */
  def streamRead(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("gstreamq").toString
    val p = pts(s, dir).select("id", "x", "y", "z")
    graft.sources.GeoParquet.write(p.filter(col("id") % 3 === 0), path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)
    graft.sources.GeoParquet.appendWithManifest(
      p.filter(col("id") % 3 === 1), path, 250.0)
    graft.sources.GeoParquet.appendWithManifest(
      p.filter(col("id") % 3 === 2), path, 250.0)
    val name = s"graft_stream_gate_${streamGateSeq.incrementAndGet()}"
    val q = s.readStream.format("graft").load(path)
      .groupBy((col("id") % 10).as("bucket"))
      // fixed-point sum: the streaming state merges partials in
      // batch order, so a double sum is order-sensitive at the last
      // ulp — integer milli-units make the aggregate exact
      .agg(count("*").cast("long").as("n"),
        sum((col("z") * 1000).cast("long")).as("sum_z_milli"))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()
    s.table(name).orderBy("bucket")
  }

  val streamReadSql: String =
    s"""WITH pts AS ($P)
       |SELECT id % 10 AS bucket, count(*) AS n,
       |       CAST(sum(CAST(trunc(z * 1000) AS BIGINT)) AS BIGINT) AS sum_z_milli
       |FROM pts GROUP BY 1 ORDER BY 1""".stripMargin

  /** 61z21: the CDC changelog stream, folded — the layout grows by a
    * base write + an append, then a merge-on-read DELETE; the stream
    * reads it with `.option("changelog", "true")`, so the delete
    * commit delivers the doomed rows tagged `_change_type='delete'`
    * with their commit epoch, and the consumer FOLDS the change rows
    * (per id: latest epoch wins, deletes before inserts within an
    * epoch) back to the merged present.  The oracle is that present
    * computed relationally: a retraction lost, duplicated, or
    * mis-epoched leaves a doomed row alive (or kills a live one) and
    * hash-mismatches.
    */
  def streamChangelog(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val path = java.nio.file.Files.createTempDirectory("gclogq").toString
    val p = pts(s, dir).select("id", "x", "y", "z")
    graft.sources.GeoParquet.write(p.filter(col("id") % 3 === 0), path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)
    graft.sources.GeoParquet.appendWithManifest(
      p.filter(col("id") % 3 === 1), path, 250.0)
    graft.sources.GeoParquet.deleteWhere(s, path, col("id") % 9 === 0)
    val name = s"graft_clog_gate_${streamGateSeq.incrementAndGet()}"
    val q = s.readStream.format("graft").option("changelog", "true")
      .load(path)
      .writeStream.format("memory").queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    val w = Window.partitionBy("id").orderBy(
      col("_change_epoch").desc,
      when(col("_change_type") === "insert", 1).otherwise(0).desc)
    s.table(name).withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("_change_type") === "insert")
      .select("id", "x", "y", "z").orderBy("id")
  }

  val streamChangelogSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y, z FROM pts
       |WHERE (id % 3 = 0 OR id % 3 = 1) AND id % 9 <> 0
       |ORDER BY id""".stripMargin

  // --- 61h. time-pruned box query over an ingest-grown layout: the
  // layout is built as three time-sliced appendWithManifest batches
  // (exactly what continuous ingest produces — each batch's files are
  // time-bounded), then a mid-window box+time query prunes the
  // historical and future batches from the MANIFEST's t0/t1 — no
  // layout dimension is time.  Oracle: the plain box+time filter.
  private val TimeSliceT1 = 1704844800000L // 2024-01-10
  private val TimeSliceT2 = 1705708800000L // 2024-01-20

  // --- 61y. scoped curve compaction under pressure ---
  /** Grow a curve layout with overlap pressure concentrated in one
    * key region (narrow-band appends), then
    * [[graft.sources.GeoParquet.compactCurveScoped]] rewrites ONLY
    * the pressured component and the BIGMIN box read runs against
    * the partially-compacted layout.  Untouched-files-byte-identical
    * and crash-heal proofs are ScopedCompactSpec; the oracle proves
    * the read after a partial rewrite is still exactly the filter.
    */
  def scopedCompact(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("scompq").toString
    val p = pts(s, dir).select("id", "x", "y", "z")
    graft.sources.GeoParquet.writeZOrdered(
      p.filter(col("id") % 8 === 0), path, 250.0, nFiles = 4)
    graft.sources.GeoParquet.writeManifest(s, path)
    (1 to 6).foreach { i =>
      graft.sources.GeoParquet.appendCurve(
        p.filter(col("id") % 8 === i && col("x") >= 0 && col("x") < 250.0),
        path, 250.0)
    }
    graft.sources.GeoParquet.compactCurveScoped(s, path,
      filesPerRun = 8, maxOverlap = 4)
    graft.sources.GeoParquet.queryBoxCurve(s, path,
        (-230.0, 480.0), (-470.0, 230.0), 250.0)
      .select("id", "x", "y", "z")
      .orderBy("id")
  }

  val scopedCompactSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y, z FROM pts
       |WHERE x >= -230 AND x < 480 AND y >= -470 AND y < 230
       |  AND (id % 8 = 0 OR (id % 8 <= 6 AND x >= 0 AND x < 250))
       |ORDER BY id""".stripMargin

  // --- 61x. TIME-major curve layout: secondary clustering on t ---
  /** One SHUFFLED write (worst case for batch-implied time locality:
    * every naive file would span the whole month) lands t-disjoint,
    * zkey-sorted-within files via [[graft.sources.GeoParquet.writeTimeCurve]];
    * the recent-window read then opens exactly the files whose t-run
    * overlaps the window — the time analog of BIGMIN file pruning,
    * where [[boxTime]] relies on ingest batches happening to be
    * time-bounded.  Oracle: the plain box+time filter; the
    * fewer-files-than-envelope-plan proof is TimeCurveSpec.
    */
  def timeCurve(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("timecurve").toString
    val p = pts(s, dir).select("id", "x", "y", "z", "t")
    graft.sources.GeoParquet.writeTimeCurve(p, path, 250.0, nFiles = 16)
    graft.sources.GeoParquet.writeManifest(s, path)
    graft.sources.GeoParquet.queryBoxTimeViaManifest(s, path,
        (-300.0, 300.0), (-300.0, 300.0), (1705000000000L, 1705200000000L))
      .select("id", "x", "y", "z", "t")
      .orderBy("id")
  }

  val timeCurveSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y, z, t FROM pts
       |WHERE x >= -300 AND x < 300 AND y >= -300 AND y < 300
       |  AND t >= 1705000000000 AND t < 1705200000000
       |ORDER BY id""".stripMargin

  def boxTime(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("boxtime").toString
    val p = pts(s, dir).select("id", "x", "y", "z", "t")
    // coarse δ=250 bins (8×8 over the ±1000 domain): a temp layout's
    // bin count should be bounded, not row-count-proportional — at
    // δ=50 the three time-sliced writes churn ~1600 directories each
    // and the staged renames dominate the query 30:1
    graft.sources.GeoParquet.write(p.filter(col("t") < TimeSliceT1), path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)
    graft.sources.GeoParquet.appendWithManifest(
      p.filter(col("t") >= TimeSliceT1 && col("t") < TimeSliceT2), path, 250.0)
    graft.sources.GeoParquet.appendWithManifest(
      p.filter(col("t") >= TimeSliceT2), path, 250.0)
    graft.sources.GeoParquet.queryBoxTimeViaManifest(s, path,
        (-300.0, 300.0), (-300.0, 300.0), (1705000000000L, 1705600000000L))
      .select("id", "x", "y", "z", "t")
      .orderBy("id")
  }

  // --- 61i. manifest-answered box min/max (aggregate pushdown) ---
  /** Box COUNT + MIN/MAX(z) planned through the manifest's z0/z1
    * stats: interior files contribute their manifest row unopened
    * (min/max are decomposable aggregates), only boundary-straddlers
    * are scanned — the Iceberg/Trino stats-pushdown story on the same
    * sidecar q_count_box uses for counts.  The box edges deliberately
    * avoid bin boundaries so both the interior and boundary legs
    * execute.
    */
  def minmaxBox(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("minmaxbox").toString
    graft.sources.GeoParquet.write(
      pts(s, dir).select("id", "x", "y", "z"), path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)
    graft.sources.GeoParquet.minMaxBoxViaManifest(s, path,
      (-230.0, 480.0), (-470.0, 230.0))
  }

  val minmaxBoxSql: String =
    s"""WITH pts AS ($P)
       |SELECT count(*) AS n, min(z) AS zmin, max(z) AS zmax FROM pts
       |WHERE x >= -230 AND x < 480 AND y >= -470 AND y < 230""".stripMargin

  // --- 61k. merge-on-read deletes: box query under pending tombstones ---
  /** Write a layout, register every `id % 7 == 0` row for deletion
    * (tombstones only — zero data files rewritten), then box-query
    * through the manifest reader: the pending deletes are subtracted
    * by the read-side anti-join, so the oracle is simply the box
    * minus the doomed ids.  The 100 TB story: a dedup drop-list or a
    * purge takes effect instantly and the rewrite cost is deferred to
    * the next compaction.
    */
  def deleteBox(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("delbox").toString
    val p = pts(s, dir).select("id", "x", "y", "z")
    graft.sources.GeoParquet.write(p, path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)
    graft.sources.GeoParquet.deleteIds(
      p.filter(col("id") % 7 === 0).select("id"), path)
    graft.sources.GeoParquet.queryBoxViaManifest(s, path,
        (-230.0, 480.0), (-470.0, 230.0))
      .select("id", "x", "y", "z")
      .orderBy("id")
  }

  val deleteBoxSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y, z FROM pts
       |WHERE x >= -230 AND x < 480 AND y >= -470 AND y < 230
       |  AND id % 7 <> 0
       |ORDER BY id""".stripMargin

  // --- 61v. manifest id-filter point probe ---
  /** Fetch points BY ID through the manifest's per-file membership
    * filters (no box to prune on): the layout is grown in two commits
    * so the probe must prune across both the base write and an
    * appended batch's manifest rows; only might-contain files open,
    * then the exact predicate.  The reference's "points by index"
    * fetch (geo_index query → indexed read), made sound at 100 TB by
    * never-false-negative position sets.
    */
  def idProbe(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("idprobe").toString
    val p = pts(s, dir).select("id", "x", "y", "z")
    graft.sources.GeoParquet.write(p.filter(col("id") % 2 === 0), path, 250.0)
    // membership filters are opt-in: only declared layouts pay the
    // per-stats collect_set, and only they serve pruned point probes
    graft.sources.GeoParquet.declareFilterCols(s, path, Seq("id"))
    graft.sources.GeoParquet.writeManifest(s, path)
    graft.sources.GeoParquet.appendWithManifest(
      p.filter(col("id") % 2 === 1), path, 250.0)
    graft.sources.GeoParquet.queryIdsViaManifest(s, path,
        Seq(10L, 501L, 1234L, 4321L, 7777L))
      .select("id", "x", "y", "z")
      .orderBy("id")
  }

  val idProbeSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y, z FROM pts
       |WHERE id IN (10, 501, 1234, 4321, 7777)
       |ORDER BY id""".stripMargin

  // --- 24c. query_latlon: one-call lat/lon probe through a real CRS ---
  /** geo_index.query_latlon (geo_index.py:328-342) as a single
    * surface: probe (lat, lon) points forward-project through
    * EPSG:3031 (libm accuracy), snap to their δ=250 bin centers, and
    * the frame returns every point in a matched bin.  The oracle pins
    * the matched BIN SET as literals computed independently (same
    * Snyder formulas, separate implementation) — probes sit ≥5 m
    * from any bin boundary, so the sub-micrometer libm spread between
    * engines cannot flip an assignment; the row set then hash-proves
    * the snap + bin semi-join end to end.
    */
  def queryLatLonQ(s: SparkSession, dir: String): DataFrame =
    graft.PointFrame(pts(s, dir), 250.0)
      .queryLatLon(3031, Seq(
        (-89.994, 30.0), (-89.9955, 135.0),
        (-89.9975, -60.0), (-89.993, -150.0)))
      .df
      .select("id", "x", "y", "z")
      .orderBy("id")

  val queryLatLonSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y, z FROM pts
       |WHERE (CAST(round(x/250.0)*250 AS BIGINT),
       |       CAST(round(y/250.0)*250 AS BIGINT)) IN
       |      ((250, 500), (250, -250), (-250, 250), (-500, -750))
       |ORDER BY id""".stripMargin

  // --- 61w. multi-column manifest membership probe ---
  /** Point probe on TWO declared filter columns at once (id AND
    * user): the layout maintains a membership filter per declared
    * column on the same manifest sidecar, candidate file sets
    * intersect (a file opens only if it might hold a probed id AND a
    * probed user), and the probe keys arrive as FRAMES — the shape a
    * 100 TB "fetch these users' flagged points" lookup has, with
    * both the manifest filters and the key batches staying
    * distributed end to end.
    */
  def multiProbe(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("multiprobe").toString
    val p = pts(s, dir).select("id", "user_id", "x", "y", "z")
    graft.sources.GeoParquet.write(p.filter(col("id") % 2 === 0), path, 250.0)
    graft.sources.GeoParquet.declareFilterCols(s, path, Seq("id", "user_id"))
    graft.sources.GeoParquet.writeManifest(s, path)
    graft.sources.GeoParquet.appendWithManifest(
      p.filter(col("id") % 2 === 1), path, 250.0)
    val idKeys = p.select("id").filter(col("id") % 97 === 0)
    val userKeys = p.select("user_id").filter(col("user_id") % 5 === 0).distinct()
    graft.sources.GeoParquet.queryKeysViaManifest(s, path,
        Seq("id" -> idKeys, "user_id" -> userKeys))
      .select("id", "user_id", "x", "y", "z")
      .orderBy("id")
  }

  val multiProbeSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, user_id, x, y, z FROM pts
       |WHERE id % 97 = 0 AND user_id % 5 = 0
       |ORDER BY id""".stripMargin

  // --- 61u. incrementally-maintained per-bin aggregate (materialized view) ---
  /** Grow a layout in three commits, [[graft.sources.MaterializedAgg.refresh]]ing
    * the per-bin rollup after each — every refresh reads ONLY the
    * files the changelog says landed since the last one.  The oracle
    * is the from-scratch GROUP BY over all the points, so the
    * hash-match proves the monoid merges (count / integral sum /
    * min / max) reproduce the one-shot rollup exactly — the
    * incremental-view-maintenance contract at any number of batches.
    */
  def incrAgg(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("incragg").toString
    val st = java.nio.file.Files.createTempDirectory("incragg_state").toString
    val p = pts(s, dir).select("id", "x", "y", "z")
    graft.sources.GeoParquet.write(p.filter(col("id") % 3 === 0), path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)
    graft.sources.MaterializedAgg.refresh(s, path, st, 250.0)
    graft.sources.GeoParquet.appendWithManifest(
      p.filter(col("id") % 3 === 1), path, 250.0)
    graft.sources.MaterializedAgg.refresh(s, path, st, 250.0)
    graft.sources.GeoParquet.appendWithManifest(
      p.filter(col("id") % 3 === 2), path, 250.0)
    graft.sources.MaterializedAgg.refresh(s, path, st, 250.0)
    graft.sources.MaterializedAgg.read(s, st).orderBy("bin_x", "bin_y")
  }

  val incrAggSql: String =
    s"""WITH pts AS ($P)
       |SELECT CAST(round(x/250.0)*250 AS BIGINT) AS bin_x,
       |       CAST(round(y/250.0)*250 AS BIGINT) AS bin_y,
       |       count(*) AS n, CAST(sum(id) AS BIGINT) AS sum_id,
       |       min(z) AS z_min, max(z) AS z_max
       |FROM pts GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  // --- 61t. add-column schema evolution, read back through the manifest ---
  /** Build a layout in the classic (id,x,y,z) shape, then append one
    * batch that ADDS a column (event_type) and one that LACKS z — the
    * ingest reality at 100 TB, where upstream producers change shape
    * mid-corpus.  The `_schema` sidecar records the union; declared-
    * schema reads null-fill what each file predates (no mergeSchema
    * footer pass), the manifest stays fresh through both appends, and
    * the read-back runs the PRUNED path.  The oracle states the
    * contract directly: z is null for the z-less slice, event_type
    * only for the slice that carried it.
    */
  def schemaEvolve(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("evolve").toString
    val p = pts(s, dir)
    graft.sources.GeoParquet.write(
      p.filter(col("id") % 3 === 0).select("id", "x", "y", "z"), path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)
    graft.sources.GeoParquet.appendWithManifest(
      p.filter(col("id") % 3 === 1).select("id", "x", "y", "z", "event_type"),
      path, 250.0)
    graft.sources.GeoParquet.appendWithManifest(
      p.filter(col("id") % 3 === 2).select("id", "x", "y"), path, 250.0)
    graft.sources.GeoParquet.queryBoxViaManifest(s, path,
        (-230.0, 480.0), (-470.0, 230.0))
      .select("id", "z", "event_type")
      .orderBy("id")
  }

  val schemaEvolveSql: String =
    s"""WITH pts AS ($P)
       |SELECT id,
       |       CASE WHEN id % 3 = 2 THEN NULL ELSE z END AS z,
       |       CASE WHEN id % 3 = 1 THEN event_type ELSE NULL END AS event_type
       |FROM pts
       |WHERE x >= -230 AND x < 480 AND y >= -470 AND y < 230
       |ORDER BY id""".stripMargin

  // --- 61l. MERGE/upsert by key, read back through the manifest ---
  /** Write a layout, upsert a modified copy of every `id % 11 == 0`
    * row (z shifted by +1000 — same key, new value), and box-query
    * through the manifest reader.  The oracle expresses the merge as
    * a CASE over the base table, so the hash-match proves replaced
    * rows carry the new value exactly once and untouched rows are
    * bit-identical — the MERGE INTO contract.
    */
  def upsertBox(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("upsert").toString
    val p = pts(s, dir).select("id", "x", "y", "z")
    graft.sources.GeoParquet.write(p, path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)
    graft.sources.GeoParquet.upsert(
      p.filter(col("id") % 11 === 0).withColumn("z", col("z") + 1000.0),
      path, "id", 250.0)
    graft.sources.GeoParquet.queryBoxViaManifest(s, path,
        (-230.0, 480.0), (-470.0, 230.0))
      .select("id", "x", "y", "z")
      .orderBy("id")
  }

  val upsertBoxSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y,
       |       CASE WHEN id % 11 = 0 THEN z + 1000.0 ELSE z END AS z
       |FROM pts
       |WHERE x >= -230 AND x < 480 AND y >= -470 AND y < 230
       |ORDER BY id""".stripMargin

  // --- 61m. O(batch) MERGE via positional deletes, pruned read-back ---
  /** As [[upsertBox]] but through [[graft.sources.GeoParquet.upsertPositional]]:
    * no compaction, no rewrite — old copies die by (file, row) address
    * and the manifest stays fresh throughout, so the read-back runs
    * the PRUNED manifest path with the positional subtraction riding
    * it.  Same MERGE contract, the scale-honest mechanism.
    */
  def upsertPosBox(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("upsertp").toString
    val p = pts(s, dir).select("id", "x", "y", "z")
    graft.sources.GeoParquet.write(p, path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)
    graft.sources.GeoParquet.upsertPositional(
      p.filter(col("id") % 13 === 0).withColumn("z", col("z") + 500.0),
      path, "id", 250.0)
    graft.sources.GeoParquet.queryBoxViaManifest(s, path,
        (-230.0, 480.0), (-470.0, 230.0))
      .select("id", "x", "y", "z")
      .orderBy("id")
  }

  val upsertPosBoxSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y,
       |       CASE WHEN id % 13 = 0 THEN z + 500.0 ELSE z END AS z
       |FROM pts
       |WHERE x >= -230 AND x < 480 AND y >= -470 AND y < 230
       |ORDER BY id""".stripMargin

  // --- 61o. TTL retention: expire-then-query through the merged read ---
  /** Write a layout with the time column, expire everything before a
    * fixed cutoff (positional tombstones — no rewrite), box-query the
    * survivors through the manifest reader.  The oracle states the
    * retention predicate directly.
    */
  def expireBox(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("expire").toString
    val p = pts(s, dir).select("id", "x", "y", "z", "t")
    graft.sources.GeoParquet.write(p, path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)
    graft.sources.GeoParquet.expireOlderThan(s, path, 1705300000000L)
    graft.sources.GeoParquet.queryBoxViaManifest(s, path,
        (-230.0, 480.0), (-470.0, 230.0))
      .select("id", "x", "y", "z", "t")
      .orderBy("id")
  }

  val expireBoxSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y, z, t FROM pts
       |WHERE x >= -230 AND x < 480 AND y >= -470 AND y < 230
       |  AND t >= 1705300000000
       |ORDER BY id""".stripMargin

  // --- 61p. keyed MERGE target: upsertKeyed read back merged ---
  /** The [[graft.sources.GeoParquet.writeKeyed]]/upsertKeyed pair as
    * an oracle query: a key-clustered (id-sorted) table, a narrow key
    * band replaced, the merged read hash-matched against the CASE
    * oracle — the CDC-table MERGE contract with the position lookup
    * pruned by the manifest's key ranges.
    */
  def upsertKeyedQ(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("upsk").toString
    val p = pts(s, dir).select("id", "z")
    graft.sources.GeoParquet.writeKeyed(p, path, "id", nFiles = 8)
    graft.sources.GeoParquet.upsertKeyed(
      p.filter(col("id") >= 1000 && col("id") < 3000)
        .withColumn("z", col("z") + 250.0), path, "id")
    graft.sources.GeoParquet.readMerged(s, path)
      .select("id", "z")
      .orderBy("id")
  }

  val upsertKeyedSql: String =
    s"""WITH pts AS ($P)
       |SELECT id,
       |       CASE WHEN id >= 1000 AND id < 3000 THEN z + 250.0 ELSE z END AS z
       |FROM pts ORDER BY id""".stripMargin

  // --- 61s. STRING-key MERGE against a key-clustered target ---
  /** [[upsertKeyedQ]] with the real CDC key shape — a zero-padded
    * string id (UUID/composite-key stand-in): the manifest's [k0,k1]
    * become lexicographic string ranges and the doomed-address
    * lookup prunes on them, so a narrow key band touches only its
    * own files.  The hash-match against the CASE oracle proves the
    * string merge is exactly-once end to end.
    */
  def upsertStr(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("upstr").toString
    val p = pts(s, dir).select(
      concat(lit("K"), lpad(col("id").cast("string"), 8, "0")).as("sid"),
      col("z"))
    graft.sources.GeoParquet.writeKeyed(p, path, "sid", nFiles = 8)
    graft.sources.GeoParquet.upsertKeyed(
      p.filter(col("sid") >= "K00001000" && col("sid") < "K00003000")
        .withColumn("z", col("z") + 250.0), path, "sid")
    graft.sources.GeoParquet.readMerged(s, path)
      .select("sid", "z")
      .orderBy("sid")
  }

  val upsertStrSql: String =
    s"""WITH pts AS ($P)
       |SELECT 'K' || lpad(CAST(id AS VARCHAR), 8, '0') AS sid,
       |       CASE WHEN id >= 1000 AND id < 3000 THEN z + 250.0 ELSE z END AS z
       |FROM pts ORDER BY sid""".stripMargin

  // --- 61z27. COMPOSITE (tenant, id) cluster key: keyed MERGE ---
  /** [[upsertKeyedQ]] over a TWO-column cluster key — the
    * multi-tenant CDC shape: rows cluster on `struct(tenant, id)`
    * (lexicographic order = the multi-column sort), the manifest's
    * [k0,k1] become struct-typed key ranges, and the merge's
    * doomed-address lookup prunes on them with leading-prefix
    * semantics.  The CASE oracle hash-match proves a one-tenant id
    * band replaced exactly once while every other tenant's copy of
    * the same ids is untouched — the discriminating property a
    * single-column key cannot express.
    */
  def upsertKeyed2(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("upsk2").toString
    val p = pts(s, dir).select(
      concat(lit("T"), (col("id") % 7).cast("string")).as("tenant"),
      col("id"), col("z"))
    graft.sources.GeoParquet.writeKeyed(p, path, Seq("tenant", "id"),
      nFiles = 14)
    graft.sources.GeoParquet.upsertKeyed(
      p.filter(col("tenant") === "T3" &&
          col("id") >= 1000 && col("id") < 3000)
        .withColumn("z", col("z") + 250.0),
      path, Seq("tenant", "id"), nFiles = 1)
    graft.sources.GeoParquet.readMerged(s, path)
      .select("tenant", "id", "z")
      .orderBy("tenant", "id")
  }

  val upsertKeyed2Sql: String =
    s"""WITH pts AS ($P)
       |SELECT 'T' || CAST(id % 7 AS VARCHAR) AS tenant, id,
       |       CASE WHEN id % 7 = 3 AND id >= 1000 AND id < 3000
       |            THEN z + 250.0 ELSE z END AS z
       |FROM pts ORDER BY tenant, id""".stripMargin

  // --- 61z28. COMPOSITE key point/band lookup through the SQL face ---
  /** [[sqlKeyProbe]]'s two-column sibling: `tenant = 'T3' AND id ∈
    * [band)` over a (tenant, id)-clustered layout — the leading
    * tenant predicate prunes unconditionally on the struct [k0,k1]'s
    * first field, and the id band refines on files constant in
    * tenant ([[graft.sources.GeoParquet.compositeKeyRangeCond]]).
    * The in-query assertion pins pruned < total; the oracle is the
    * plain band select.
    */
  def sqlKeyProbe2(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("sqlkeyq2").toString
    val p = pts(s, dir).select(
      concat(lit("T"), (col("id") % 7).cast("string")).as("tenant"),
      col("id"), col("z"))
    graft.sources.GeoParquet.writeKeyed(p, path, Seq("tenant", "id"),
      nFiles = 16)
    s.read.format("graft").load(path)
      .createOrReplaceTempView("graft_sql_key2")
    val out = s.sql("""SELECT tenant, id, z FROM graft_sql_key2
        |WHERE tenant = 'T3' AND id >= 100 AND id < 3000
        |ORDER BY id""".stripMargin)
    out.collect() // force planning for the shape assertion
    val planned =
      graft.sources.v2.GraftSource.lastPlannedFiles.get(path).size
    val total = s.read.parquet(s"$path/_manifest").count()
    require(planned < total,
      s"composite key probe planned $planned of $total files — the " +
        "struct [k0,k1] leading-prefix prune did not fire")
    out
  }

  val sqlKeyProbe2Sql: String =
    s"""WITH pts AS ($P)
       |SELECT 'T' || CAST(id % 7 AS VARCHAR) AS tenant, id, z
       |FROM pts
       |WHERE id % 7 = 3 AND id >= 100 AND id < 3000
       |ORDER BY id""".stripMargin

  // --- 61z29. rollback_to: the present restored to a pinned commit ---
  /** The "undo the bad commit" lifecycle as an oracle query: seed
    * (even ids), commit a good append (odd ids), commit a BAD batch
    * (ids shifted out of range), roll back to the good epoch through
    * the catalog procedure, and read the present by name.  The oracle
    * is the union of the two surviving commits: a rollback that
    * leaks the bad batch, loses good files, or breaks the manifest
    * hash-mismatches.
    */
  def sqlRollback(s: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("sqlrb").toString
    val path = s"$wh/geo/rb"
    val p = pts(s, dir).select("id", "x", "y", "z")
    graft.sources.GeoParquet.write(p.filter(col("id") % 2 === 0), path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)                  // 0
    graft.sources.GeoParquet.appendWithManifest(
      p.filter(col("id") % 2 === 1), path, 250.0)                    // 1
    graft.sources.GeoParquet.appendWithManifest(
      p.select((col("id") + 10000000L).as("id"),
        col("x"), col("y"), (col("z") * -1).as("z")), path, 250.0)   // 2: bad
    s.conf.set("spark.sql.catalog.graft_rb",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_rb.warehouse", wh)
    s.sql("CALL graft_rb.system.rollback_to('geo.rb', 1)").collect()
    s.sql("""SELECT id, x, y, z FROM graft_rb.geo.rb
            |WHERE x >= -230 AND x < 480 AND y >= -470 AND y < 230
            |ORDER BY id""".stripMargin)
  }

  val sqlRollbackSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y, z FROM pts
       |WHERE x >= -230 AND x < 480 AND y >= -470 AND y < 230
       |ORDER BY id""".stripMargin

  // --- 61z30. manifest coalesce: metadata compaction is invisible ---
  /** [[graft.sources.GeoParquet.compactManifest]] as an oracle query:
    * three commits (three manifest parts), coalesce to one part, box
    * query through the SQL face.  The oracle is the plain box select
    * over all three batches — a coalesce that loses manifest rows,
    * re-stamps epochs, or breaks freshness hash-mismatches (and the
    * in-query assertion pins parts == 1 and reads still pruned).
    */
  def sqlCoalesce(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("sqlco").toString
    val p = pts(s, dir).select("id", "x", "y", "z")
    graft.sources.GeoParquet.write(p.filter(col("id") % 3 === 0), path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)
    graft.sources.GeoParquet.appendWithManifest(
      p.filter(col("id") % 3 === 1), path, 250.0)
    graft.sources.GeoParquet.appendWithManifest(
      p.filter(col("id") % 3 === 2), path, 250.0)
    graft.sources.GeoParquet.compactManifest(s, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$path/_manifest"))
      .count(_.getPath.getName.endsWith(".parquet"))
    require(parts == 1, s"manifest coalesce left $parts parts")
    s.read.format("graft").load(path)
      .createOrReplaceTempView("graft_sql_coalesce")
    val out = s.sql("""SELECT id, x, y, z FROM graft_sql_coalesce
        |WHERE x >= -230 AND x < 480 AND y >= -470 AND y < 230
        |ORDER BY id""".stripMargin)
    out.collect() // force planning for the shape assertion
    val planned =
      graft.sources.v2.GraftSource.lastPlannedFiles.get(path).size
    require(planned < s.read.parquet(path).inputFiles.length,
      "reads lost pruning across the manifest coalesce")
    out
  }

  val sqlCoalesceSql: String = sqlRollbackSql

  // --- 61r. incremental consumption: only the batches since a checkpoint ---
  /** Seed (ids ≡ 0 mod 3) at epoch 0, append two batches (epochs 1,
    * 2), then read the changes since epoch 0 — exactly the two
    * appended batches, never the seed.  The periodic-ETL sync
    * pattern: a consumer checkpoints the epoch it has seen and reads
    * only newer files.
    */
  def changesSince(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("changes").toString
    val p = pts(s, dir).select("id", "x", "y", "z")
    graft.sources.GeoParquet.write(p.filter(col("id") % 3 === 0), path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)
    graft.sources.GeoParquet.appendWithManifest(
      p.filter(col("id") % 3 === 1), path, 250.0)
    graft.sources.GeoParquet.appendWithManifest(
      p.filter(col("id") % 3 === 2), path, 250.0)
    graft.sources.GeoParquet.readChangesSince(s, path, 0L)
      .select("id", "x", "y", "z")
      .orderBy("id")
  }

  val changesSinceSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y, z FROM pts
       |WHERE id % 3 <> 0
       |ORDER BY id""".stripMargin

  // --- 61z22. batch changelog with delete retractions ---
  /** The CDC twin of [[changesSince]]: seed (ids ≡ 0 mod 3, epoch 0),
    * append (≡ 1, epoch 1), DELETE (id ≡ 0 mod 9, epoch 2), append
    * (≡ 2, epoch 3), then one BATCH changelog read of `(0, described]`
    * — the two appends arrive as epoch-tagged inserts and the delete
    * commit's doomed rows arrive as retractions with their content and
    * epoch ([[graft.sources.v2.GraftChanges]]).  The periodic CDC-sync
    * pattern without streaming infrastructure.  Oracle: the three
    * change sets written out relationally — a lost retraction, a
    * leaked floor-corpus row, or a mis-stamped epoch hash-mismatches.
    */
  def changesMor(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("changemor").toString
    val p = pts(s, dir).select("id", "x", "y", "z")
    graft.sources.GeoParquet.write(p.filter(col("id") % 3 === 0), path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)
    graft.sources.GeoParquet.appendWithManifest(
      p.filter(col("id") % 3 === 1), path, 250.0)
    graft.sources.GeoParquet.deleteWhere(s, path, col("id") % 9 === 0)
    graft.sources.GeoParquet.appendWithManifest(
      p.filter(col("id") % 3 === 2), path, 250.0)
    s.read.format("graft").option("changelog", "true")
      .option("changesFrom", "0").load(path)
      .select(col("id"), col("x"), col("y"), col("z"),
        col("_change_type"), col("_change_epoch").cast("long").as("_change_epoch"))
      .orderBy("_change_epoch", "id")
  }

  val changesMorSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y, z, chg AS "_change_type",
       |       CAST(ep AS BIGINT) AS "_change_epoch"
       |FROM (
       |  SELECT id, x, y, z, 'insert' AS chg, 1 AS ep FROM pts WHERE id % 3 = 1
       |  UNION ALL
       |  SELECT id, x, y, z, 'delete' AS chg, 2 AS ep FROM pts WHERE id % 9 = 0
       |  UNION ALL
       |  SELECT id, x, y, z, 'insert' AS chg, 3 AS ep FROM pts WHERE id % 3 = 2
       |)
       |ORDER BY ep, id""".stripMargin

  // --- 61j. snapshot read: the layout as of an earlier epoch ---
  /** Time travel on the manifest's per-row commit epoch: seed batch
    * (ids even) manifested at epoch 0, second batch (ids odd)
    * incrementally appended at epoch 1, then the box read AS OF
    * epoch 0 — the appended files are planned away, so the oracle is
    * simply the seed batch's box subset.  Snapshot isolation for a
    * continuously-ingesting layout, at the cost of one BIGINT per
    * manifest row.
    */
  def snapshotBox(s: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("snapbox").toString
    val p = pts(s, dir).select("id", "x", "y", "z")
    graft.sources.GeoParquet.write(p.filter(col("id") % 2 === 0), path, 250.0)
    graft.sources.GeoParquet.writeManifest(s, path)
    graft.sources.GeoParquet.appendWithManifest(
      p.filter(col("id") % 2 === 1), path, 250.0)
    graft.sources.GeoParquet.queryBoxAsOf(s, path, 0L,
        (-230.0, 480.0), (-470.0, 230.0))
      .select("id", "x", "y", "z")
      .orderBy("id")
  }

  val snapshotBoxSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y, z FROM pts
       |WHERE x >= -230 AND x < 480 AND y >= -470 AND y < 230
       |  AND id % 2 = 0
       |ORDER BY id""".stripMargin

  val boxTimeSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, x, y, z, t FROM pts
       |WHERE x >= -300 AND x < 300 AND y >= -300 AND y < 300
       |  AND t >= 1705000000000 AND t < 1705600000000
       |ORDER BY id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hilbert"         -> (hilbertKey _),
    "q_zorder"          -> (zorderKey _),
    "q_curve_query"     -> (curveQuery _),
    "q_curve_query_h"   -> (curveQueryH _),
    "q_count_box"       -> (countBox _),
    "q_sql_box"         -> (sqlBox _),
    "q_sql_agg"         -> (sqlAgg _),
    "q_sql_write"       -> (sqlWrite _),
    "q_sql_asof"        -> (sqlAsOf _),
    "q_sql_time_travel" -> (sqlTimeTravel _),
    "q_sql_key_probe"   -> (sqlKeyProbe _),
    "q_sql_ddl_key"     -> (sqlDdlKey _),
    "q_sql_limit"       -> (sqlLimit _),
    "q_sql_topk"        -> (sqlTopk _),
    "q_sql_topk2"       -> (sqlTopk2 _),
    "q_sql_ddl_curve"   -> (sqlDdlCurve _),
    "q_sql_sum"         -> (sqlSum _),
    "q_stale_tiles"     -> (staleTilesQ _),
    "q_sql_spj"         -> (sqlSpj _),
    "q_bucket_probe"    -> (bucketProbe _),
    "q_sql_catalog"     -> (sqlCatalog _),
    "q_sql_dim_join"    -> (sqlDimJoin _),
    "q_sql_update"      -> (sqlUpdate _),
    "q_sql_mor"         -> (sqlMor _),
    "q_sql_asof_mor"    -> (sqlAsOfMor _),
    "q_stream_read"     -> (streamRead _),
    "q_stream_changelog" -> (streamChangelog _),
    "q_sql_mor_count"   -> (sqlMorCount _),
    "q_sql_mor_minmax"  -> (sqlMorMinMax _),
    "q_minmax_box"      -> (minmaxBox _),
    "q_snapshot_box"    -> (snapshotBox _),
    "q_delete_box"      -> (deleteBox _),
    "q_upsert_box"      -> (upsertBox _),
    "q_upsert_pos"      -> (upsertPosBox _),
    "q_upsert_keyed"    -> (upsertKeyedQ _),
    "q_upsert_keyed2"   -> (upsertKeyed2 _),
    "q_upsert_str"      -> (upsertStr _),
    "q_sql_key_probe2"  -> (sqlKeyProbe2 _),
    "q_sql_rollback"    -> (sqlRollback _),
    "q_sql_coalesce"    -> (sqlCoalesce _),
    "q_schema_evolve"   -> (schemaEvolve _),
    "q_incr_agg"        -> (incrAgg _),
    "q_id_probe"        -> (idProbe _),
    "q_multi_probe"     -> (multiProbe _),
    "q_query_latlon"    -> (queryLatLonQ _),
    "q_expire_box"      -> (expireBox _),
    "q_changes_since"   -> (changesSince _),
    "q_changes_mor"     -> (changesMor _),
    "q_box_time"        -> (boxTime _),
    "q_time_curve"      -> (timeCurve _),
    "q_scoped_compact"  -> (scopedCompact _),
    "q_geoindex_build"  -> (geoindexBuild _),
    "q_index_merge"     -> (indexMerge _),
    "q_geo_query_box"   -> (geoQueryBox _),
    "q_geo_layout_query" -> (geoLayoutQuery _),
    "q_geo_query_pad"   -> (geoQueryPad _),
    "q_geo_intersect"   -> (geoIntersect _),
    "q_geo_intersect_pad" -> (geoIntersectPad _),
    "q_unique_points"   -> (uniquePoints _),
    "q_offset_coalesce" -> (offsetCoalesce _),
    "q_hier_index"      -> (hierIndex _),
    "q_blockmedian"     -> (blockmedian _),
    "q_blockmedian_idx" -> (blockmedianIdx _),
    "q_blockmax"        -> (blockmax _),
    "q_block_stats"     -> (blockStats _),
    "q_tile_assign"     -> (tileAssign _),
    "q_tile_index"      -> (tileIndex _))

  val oracles: Map[String, String] = Map(
    "q_hilbert"         -> hilbertKeySql,
    "q_zorder"          -> zorderKeySql,
    "q_curve_query"     -> curveQuerySql,
    "q_curve_query_h"   -> curveQueryHSql,
    "q_count_box"       -> countBoxSql,
    "q_sql_box"         -> sqlBoxSql,
    "q_sql_agg"         -> sqlAggSql,
    "q_sql_write"       -> sqlWriteSql,
    "q_sql_asof"        -> sqlAsOfSql,
    "q_sql_time_travel" -> sqlTimeTravelSql,
    "q_sql_key_probe"   -> sqlKeyProbeSql,
    "q_sql_ddl_key"     -> sqlDdlKeySql,
    "q_sql_limit"       -> sqlLimitSql,
    "q_sql_topk"        -> sqlTopkSql,
    "q_sql_topk2"       -> sqlTopk2Sql,
    "q_sql_ddl_curve"   -> sqlDdlCurveSql,
    "q_sql_sum"         -> sqlSumSql,
    "q_stale_tiles"     -> staleTilesSql,
    "q_sql_spj"         -> sqlSpjSql,
    "q_bucket_probe"    -> bucketProbeSql,
    "q_sql_catalog"     -> sqlCatalogSql,
    "q_sql_dim_join"    -> sqlDimJoinSql,
    "q_sql_update"      -> sqlUpdateSql,
    "q_sql_mor"         -> sqlMorSql,
    "q_sql_asof_mor"    -> sqlAsOfMorSql,
    "q_stream_read"     -> streamReadSql,
    "q_stream_changelog" -> streamChangelogSql,
    "q_sql_mor_count"   -> sqlMorCountSql,
    "q_sql_mor_minmax"  -> sqlMorMinMaxSql,
    "q_minmax_box"      -> minmaxBoxSql,
    "q_snapshot_box"    -> snapshotBoxSql,
    "q_delete_box"      -> deleteBoxSql,
    "q_upsert_box"      -> upsertBoxSql,
    "q_upsert_pos"      -> upsertPosBoxSql,
    "q_upsert_keyed"    -> upsertKeyedSql,
    "q_upsert_keyed2"   -> upsertKeyed2Sql,
    "q_upsert_str"      -> upsertStrSql,
    "q_sql_key_probe2"  -> sqlKeyProbe2Sql,
    "q_sql_rollback"    -> sqlRollbackSql,
    "q_sql_coalesce"    -> sqlCoalesceSql,
    "q_schema_evolve"   -> schemaEvolveSql,
    "q_incr_agg"        -> incrAggSql,
    "q_id_probe"        -> idProbeSql,
    "q_multi_probe"     -> multiProbeSql,
    "q_query_latlon"    -> queryLatLonSql,
    "q_expire_box"      -> expireBoxSql,
    "q_changes_since"   -> changesSinceSql,
    "q_changes_mor"     -> changesMorSql,
    "q_box_time"        -> boxTimeSql,
    "q_time_curve"      -> timeCurveSql,
    "q_scoped_compact"  -> scopedCompactSql,
    "q_geoindex_build"  -> geoindexBuildSql,
    "q_index_merge"     -> indexMergeSql,
    "q_geo_query_box"   -> geoQueryBoxSql,
    "q_geo_layout_query" -> geoLayoutQuerySql,
    "q_geo_query_pad"   -> geoQueryPadSql,
    "q_geo_intersect"   -> geoIntersectSql,
    "q_geo_intersect_pad" -> geoIntersectPadSql,
    "q_unique_points"   -> uniquePointsSql,
    "q_offset_coalesce" -> offsetCoalesceSql,
    "q_hier_index"      -> hierIndexSql,
    "q_blockmedian"     -> blockmedianSql,
    "q_blockmedian_idx" -> blockmedianIdxSql,
    "q_blockmax"        -> blockmaxSql,
    "q_block_stats"     -> blockStatsSql,
    "q_tile_assign"     -> tileAssignSql,
    "q_tile_index"      -> tileIndexSql)
}
