package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sources.{Atl06H5, Atl11H5, GeoIndexH5, IndexedH5}

/** HDF5-format closure queries: the reference's primary container
  * (every reader in PointDatabase opens `.h5` through h5py) pushed
  * through graft's self-contained codec end-to-end, with the parquet
  * tables as the DuckDB-checkable ground truth — the `q_geotiff_dem`
  * pattern: a hash match proves the container round-trip is
  * BIT-LOSSLESS, not merely plausible.
  */
object H5Ops {

  private val P = Tables.eventsPointsSql

  // --- positional-run scaffolding shared by the run-read and
  // pipeline queries (and the PipeSplit diagnostic): the reference's
  // `file:pair` convention maps file_num = gran*6 + beam index
  private[graft] val beams: Seq[String] =
    for (p <- 1 to 3; lr <- Seq("l", "r")) yield s"gt$p$lr"

  private[graft] def granFile(g: Int): String = f"ATL06_gran$g%04d.h5"

  /** Gaps-and-islands offset runs over per-(file_num, bin) element
    * positions — the run table a positional geo index stores.
    */
  private[graft] def islandRuns(positioned: DataFrame): DataFrame = {
    val wRun = Window.partitionBy("file_num", "bin_x", "bin_y").orderBy("pos")
    positioned
      .withColumn("island", col("pos") - row_number().over(wRun))
      .groupBy("bin_x", "bin_y", "file_num", "island")
      .agg(min("pos").as("run_start"), max("pos").as("run_end"))
      .drop("island")
  }

  /** Matched `(file_num, offset_start, offset_end)` index rows → the
    * file → beam → sorted-runs map [[Atl06H5.readRuns]] takes.
    */
  private[graft] def assembleRuns(matched: Array[org.apache.spark.sql.Row])
      : Map[String, Map[String, Seq[(Long, Long)]]] =
    matched.map(r => (r.getLong(0).toInt, (r.getLong(1), r.getLong(2))))
      .groupBy { case (fn, _) => granFile(fn / 6) }
      .map { case (f, rs) =>
        f -> rs.groupBy { case (fn, _) => beams(fn % 6) }
          .map { case (b, brs) => b -> brs.map(_._2).sortBy(_._1).toSeq }
      }

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

  /** 66h. Run-sliced box query THROUGH a saved `.h5` index — the
    * reference's core read path end-to-end (geo_index.py:494-572
    * get_data_for_geo_index: a query yields per-file
    * `[offset_start, offset_end]` runs, and ATL06_data.py:130 reads
    * ONLY those array slices).  The events points become four ATL06
    * granules; a positional geo index (offsets = element positions
    * within each granule:beam, the reference's `file:pair`
    * convention) is saved in the reference's index-file layout; a
    * box query matches bins → runs → [[Atl06H5.readRuns]], which
    * opens only matched files and inflates only chunks overlapping
    * the runs.  The oracle recomputes the box membership straight
    * from parquet, so the hash match proves index adoption, run
    * arithmetic, and sliced chunk decode compose bit-exactly.
    */
  def h5RunRead(s: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("h5run").toString
    val pts = Tables.eventsPoints(s, dir)
    Atl06H5.writeGranules(pts.select(
      (col("id") % 4).as("gran"), col("id"),
      (col("y") / 100000.0).as("latitude"),
      (col("x") / 100000.0).as("longitude"),
      col("z").as("h_li"),
      (col("t") / 1000.0).as("delta_time")), out)
    // positional index: offsets are each point's POSITION within its
    // (granule, beam) arrays — beam arrays are id-sorted at write
    val withBeam = pts.select(col("id"), col("x"), col("y"),
      (col("id") % 4).as("gran"),
      (((col("id") % 6) / 2).cast("long") + 1).as("pair"),
      (col("id") % 2).cast("long").as("lr"))
    val wPos = Window.partitionBy("gran", "pair", "lr").orderBy("id")
    val positioned = withBeam
      .withColumn("pos", (row_number().over(wPos) - 1).cast("long"))
      .withColumn("bin_x", GeoOps.binOf(col("x"), 400.0))
      .withColumn("bin_y", GeoOps.binOf(col("y"), 400.0))
      .withColumn("file_num",
        col("gran") * 6 + (col("pair") - 1) * 2 + col("lr"))
    val runs = islandRuns(positioned)
    val fileEntries =
      for (g <- 0 to 3; b <- beams) yield (s"${granFile(g)}:$b", "ATL06")
    val idxPath = s"$out/index.h5"
    GeoIndexH5.write(runs, 400.0, "+proj=stere +lat_0=-90", "/data",
      fileEntries, idxPath)
    // --- the query: box → matched bins → per-file:beam runs
    val (x0, x1, y0, y1) = (-400L, 400L, 0L, 800L)
    val matched = GeoIndexH5.readRuns(s, idxPath)
      .filter(col("bin_x").between(x0, x1) && col("bin_y").between(y0, y1))
      .select("file_num", "offset_start", "offset_end")
      .collect() // index runs are manifest-sized (the reference holds
                 // the same dict in memory, geo_index.py:407-438)
    Atl06H5.readRuns(s, out, assembleRuns(matched))
      .select(col("segment_id").as("id"), col("latitude"), col("longitude"),
        col("h_li"), col("delta_time"))
      .orderBy("id")
  }

  val h5RunReadSql: String =
    s"""WITH pts AS ($P),
       |b AS (SELECT id, y/100000.0 AS latitude, x/100000.0 AS longitude,
       |             z AS h_li, t/1000.0 AS delta_time,
       |             CAST(round(x/400.0)*400 AS BIGINT) AS bin_x,
       |             CAST(round(y/400.0)*400 AS BIGINT) AS bin_y
       |      FROM pts)
       |SELECT id, latitude, longitude, h_li, delta_time FROM b
       |WHERE bin_x BETWEEN -400 AND 400 AND bin_y BETWEEN 0 AND 800
       |ORDER BY id""".stripMargin

  /** 66e promoted to the oracle gate: ATL11 granule cycle
    * (geo_index.py:245-255, the `pt{1..3}/corrected_h` parallel
    * arrays) — write on executors, decode through binaryFile, hash
    * against the parquet recomputation.
    */
  def atl11Roundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("atl11h5").toString
    Atl11H5.writeGranules(Tables.eventsPoints(s, dir).select(
      (col("id") % 2).as("gran"), col("id"),
      (col("y") / 100000.0).as("latitude"),
      (col("x") / 100000.0).as("longitude"),
      col("z").as("h_corr"),
      (col("t") / 1000.0).as("delta_time")), out)
    Atl11H5.read(s, out).select(
      col("ref_pt").as("id"),
      col("beam_pair").cast("long").as("beam_pair"),
      col("latitude"), col("longitude"), col("h_corr"), col("delta_time"))
      .orderBy("id")
  }

  val atl11RoundtripSql: String =
    s"""WITH pts AS ($P)
       |SELECT id, CAST(id % 3 + 1 AS BIGINT) AS beam_pair,
       |       y/100000.0 AS latitude, x/100000.0 AS longitude,
       |       z AS h_corr, t/1000.0 AS delta_time
       |FROM pts ORDER BY id""".stripMargin

  /** 66g promoted: `indexed_h5` self-index cycle (geo_index.py:289-315
    * `for_file('indexed_h5')`) — the per-bin first/last ROW offsets of
    * a bin-sorted file land in the `INDEX/bin_index` 2×N layout and
    * adopt back without a point scan; the oracle recomputes the same
    * offsets with a window over the bin-sorted order.
    */
  def indexedH5Roundtrip(s: SparkSession, dir: String): DataFrame = {
    val binned = Tables.eventsPoints(s, dir).select(
      GeoOps.binOf(col("x"), 400).as("bin_x"),
      GeoOps.binOf(col("y"), 400).as("bin_y"), col("id"))
    // per-bin first/last offsets in the bin-sorted order are a prefix
    // sum over bin COUNTS — no corpus-sized single-partition window,
    // just a distributed count and a manifest-sized driver fold (the
    // reference holds the same INDEX datasets in memory)
    val counts = binned
      .groupBy("bin_x", "bin_y")
      .agg(count("*").as("n"))
      .orderBy("bin_x", "bin_y")
      .collect()
    var off = 0L
    val stats = counts.map { r =>
      val first = off; off += r.getLong(2)
      org.apache.spark.sql.Row(r.getLong(0), r.getLong(1), first, off - 1)
    }
    val w = new graft.sources.Hdf5.Writer
    w.doubles("/INDEX/bin_x", stats.map(_.getLong(0).toDouble))
    w.doubles("/INDEX/bin_y", stats.map(_.getLong(1).toDouble))
    w.longs("/INDEX/bin_index",
      stats.map(_.getLong(2)) ++ stats.map(_.getLong(3)),
      dims = Seq(2L, stats.length.toLong))
    val path = java.nio.file.Files.createTempDirectory("ixh5").toString + "/pts.h5"
    java.nio.file.Files.write(java.nio.file.Paths.get(path), w.toBytes)
    IndexedH5.adopt(s, path)
      .select(col("bin_x"), col("bin_y"), col("n_points"),
        col("id_min").as("first"), col("id_max").as("last"))
      .orderBy("bin_x", "bin_y")
  }

  val indexedH5RoundtripSql: String =
    s"""WITH pts AS ($P),
       |b AS (SELECT CAST(round(x/400.0)*400 AS BIGINT) AS bin_x,
       |             CAST(round(y/400.0)*400 AS BIGINT) AS bin_y, id
       |      FROM pts),
       |o AS (SELECT bin_x, bin_y,
       |             row_number() OVER (ORDER BY bin_x, bin_y, id) - 1 AS off
       |      FROM b)
       |SELECT bin_x, bin_y,
       |       CAST(max(off) - min(off) + 1 AS BIGINT) AS n_points,
       |       min(off) AS first, max(off) AS last
       |FROM o GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  /** 66i. Sliced point-DATA read out of a self-indexed file — the
    * reference's `read_indexed_h5_file` bin_index arm end to end
    * (geo_index.py:289-299 build → :612-629 read): the events points
    * land bin-sorted in one contiguous-dataset file with an
    * `INDEX/bin_index` 2×N offset table; a box query matches bins
    * through the ADOPTED index; the matched `[first,last]` runs
    * slice the field datasets (only overlapping chunks inflate).
    * The oracle recomputes the box membership straight from parquet.
    */
  def indexedH5Read(s: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("ixh5rd").toString
    val pts = Tables.eventsPoints(s, dir).select(
      lit(0L).as("gran"), col("id").as("ord"), col("x"), col("y"),
      col("z"), (col("t") / 1000.0).as("time"))
    IndexedH5.writeIndexed(pts, out, delta = 400.0)
    val path = s"$out/indexed_0000.h5"
    val (x0, x1, y0, y1) = (-400L, 400L, 0L, 800L)
    val runs = IndexedH5.adopt(s, path)
      .filter(col("bin_x").between(x0, x1) && col("bin_y").between(y0, y1))
      .select("id_min", "id_max")
      .collect() // matched bins only — manifest-sized, like the
                 // reference's in-memory INDEX
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    IndexedH5.readData(s, path, Seq("x", "y", "z", "time"), runs = runs)
      .select(col("x"), col("y"), col("z"), col("time").as("tsec"))
  }

  val indexedH5ReadSql: String =
    s"""WITH pts AS ($P)
       |SELECT x, y, z, t/1000.0 AS tsec FROM pts
       |WHERE CAST(round(x/400.0)*400 AS BIGINT) BETWEEN -400 AND 400
       |  AND CAST(round(y/400.0)*400 AS BIGINT) BETWEEN 0 AND 800""".stripMargin

  /** 66j. The matlab-written indexed_h5 arm (geo_index.py:318-326
    * adoption, :570 read with km bin names, :630-642 per-bin
    * datasets): a distinct-bin file whose group names carry km
    * centers over meter coordinates, with half the fields field-major
    * and half bin-major to pin BOTH of the reference's lookup probes.
    * Adoption goes through the registry kind
    * `indexed_h5_from_matlab`; the matched centers drive the per-bin
    * read with the /1000 naming.
    */
  def matlabH5Read(s: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("mlh5").toString
    val pts = Tables.eventsPoints(s, dir).select(
      lit(0L).as("gran"), col("id").as("ord"), col("x"), col("y"),
      col("z"), (col("t") / 1000.0).as("time"))
    IndexedH5.writeBinGroups(pts, out, delta = 1000.0, kmNames = true)
    val path = s"$out/bins_0000.h5"
    val (x0, x1, y0, y1) = (-1000L, 0L, 0L, 1000L)
    val bins = graft.sources.SourceRegistry
      .forFile(s, "indexed_h5_from_matlab", path, delta = 1000.0)
      .filter(col("bin_x").between(x0, x1) && col("bin_y").between(y0, y1))
      .select("bin_x", "bin_y")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    IndexedH5.readData(s, path, Seq("x", "y", "z", "time"),
      bins = bins, fromMatlab = true)
      .select(col("x"), col("y"), col("z"), col("time").as("tsec"))
  }

  val matlabH5ReadSql: String =
    s"""WITH pts AS ($P)
       |SELECT x, y, z, t/1000.0 AS tsec FROM pts
       |WHERE CAST(round(x/1000.0)*1000 AS BIGINT) BETWEEN -1000 AND 0
       |  AND CAST(round(y/1000.0)*1000 AS BIGINT) BETWEEN 0 AND 1000""".stripMargin

  /** 45d promoted: Qfit ATM1B `.h5` granule cycle (qfit_data.py:62-94
    * — root parallel arrays + `instrument_parameters` group, with the
    * filename-regex date folded into `days_J2K`, :65-75).  Three
    * granules write executor-side with hour-coded names; the decode
    * recovers every field plus the derived time axis, hashed against
    * a pure-SQL recomputation (epoch arithmetic reproduces t0Days).
    */
  def qfitH5Roundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("qfith5").toString
    graft.sources.QfitH5.writeGranules(Tables.eventsPoints(s, dir).select(
      (col("id") % 3).as("gran"),
      (col("y") / 100000.0).as("latitude"),
      (col("x") / 100000.0).as("longitude"),
      col("z").as("elevation"),
      (col("id") % 360).cast("double").as("azimuth"),
      (col("id") * 0.05).as("rel_time_s")), out)
    graft.sources.QfitH5.read(s, out).select(
      regexp_extract(col("file"), "_g(\\d+)\\.h5", 1).cast("long").as("gran"),
      col("rec_idx"), col("latitude"), col("longitude"), col("elevation"),
      col("azimuth"), col("rel_time_s"), col("days_j2k"))
  }

  val qfitH5RoundtripSql: String =
    s"""WITH pts AS ($P)
       |SELECT id % 3 AS gran,
       |       row_number() OVER (PARTITION BY id % 3 ORDER BY id) - 1 AS rec_idx,
       |       y/100000.0 AS latitude, x/100000.0 AS longitude,
       |       z AS elevation, CAST(id % 360 AS DOUBLE) AS azimuth,
       |       id * (0.05::DOUBLE) AS rel_time_s,
       |       (epoch(TIMESTAMP '2019-03-15 00:00:00')
       |        - epoch(TIMESTAMP '2000-01-01 00:00:00'))/86400.0
       |         + (id % 3)/24.0 + id * (0.05::DOUBLE)/86400.0 AS days_j2k
       |FROM pts""".stripMargin

  /** The reference's production index build, end to end
    * (index_AA_ATL06.py): STAGE 1 writes one `.h5` geo-index file per
    * granule; STAGE 2 builds the master index by ADOPTING those index
    * files (`index_list_for_files(h5_list, 'h5_geoindex', …)`) — bins
    * only, no point rescan.  The oracle recomputes each granule's
    * rollup from raw parquet and merges, so the hash match pins the
    * whole two-stage hierarchy.
    */
  def masterIndex(s: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("masteridx").toString
    val p = Tables.eventsPoints(s, dir).select(
      (col("id") % 3).as("gran"),
      GeoOps.binOf(col("x"), 400).as("bin_x"),
      GeoOps.binOf(col("y"), 400).as("bin_y"), col("id"))
    val idxFiles = (0 to 2).map { g =>
      val w = Window.partitionBy("bin_x", "bin_y").orderBy("id")
      val runs = p.filter(col("gran") === g)
        .withColumn("island", col("id") - row_number().over(w))
        .groupBy("bin_x", "bin_y", "island")
        .agg(min("id").as("run_start"), max("id").as("run_end"))
        .drop("island")
        // file_num is an index into THIS file's attribute list, which holds
        // exactly one entry (file_0); the granule identity lives in that
        // attr.  The reference's stage-1 per-granule indexes likewise
        // number files relative to their own list.
        .withColumn("file_num", lit(0L))
      val path = s"$out/granule_$g.h5"
      GeoIndexH5.write(runs, 400.0, "+proj=stere +lat_0=-90", "/data",
        Seq((f"ATL06_gran$g%04d.h5", "ATL06")), path)
      ("geoindex", path)
    }
    graft.sources.SourceRegistry.indexListForFiles(s, idxFiles, 400.0)
      .orderBy("bin_x", "bin_y")
  }

  val masterIndexSql: String =
    s"""WITH pts AS ($P),
       |b AS (SELECT id % 3 AS gran,
       |             CAST(round(x/400.0)*400 AS BIGINT) AS bin_x,
       |             CAST(round(y/400.0)*400 AS BIGINT) AS bin_y, id
       |      FROM pts),
       |g AS (SELECT gran, bin_x, bin_y, count(*) AS np,
       |             min(id) AS lo, max(id) AS hi
       |      FROM b GROUP BY 1,2,3)
       |SELECT bin_x, bin_y, CAST(sum(np) AS BIGINT) AS n_points,
       |       min(lo) AS id_min, max(hi) AS id_max,
       |       count(*) AS n_sources
       |FROM g GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  /** `index_list_for_files` over a MIXED archive (geo_index.py:679-698
    * dispatching per-file readers by type): the same point set split
    * across four kinds — parquet, csv, orc, and a self-indexed `.h5`
    * (adopted, never scanned) — indexed per file and merged under the
    * `from_list` law.  The indexed_h5 member contributes ROW offsets
    * as its id stats (exactly the reference's offset semantics for
    * that kind); the oracle mirrors that per-kind difference.
    */
  def mixedIndex(s: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("mixedidx").toString
    val pts = Tables.eventsPoints(s, dir)
      .select(col("id"), col("x"), col("y"), col("z"), col("t"))
    pts.filter(col("id") % 4 === 0).write.parquet(s"$out/part0.parquet")
    pts.filter(col("id") % 4 === 1)
      .write.option("header", "true").csv(s"$out/part1.csv")
    pts.filter(col("id") % 4 === 2).write.orc(s"$out/part2.orc")
    IndexedH5.writeIndexed(pts.filter(col("id") % 4 === 3).select(
      lit(0L).as("gran"), col("id").as("ord"), col("x"), col("y"),
      col("z"), (col("t") / 1000.0).as("time")), s"$out/p3", delta = 400.0)
    val files = Seq(
      ("parquet", s"$out/part0.parquet"),
      ("csv", s"$out/part1.csv"),
      ("orc", s"$out/part2.orc"),
      ("indexed_h5", s"$out/p3/indexed_0000.h5"))
    graft.sources.SourceRegistry.indexListForFiles(s, files, 400.0)
      .orderBy("bin_x", "bin_y")
  }

  val mixedIndexSql: String =
    s"""WITH pts AS ($P),
       |b AS (SELECT id % 4 AS kind,
       |             CAST(round(x/400.0)*400 AS BIGINT) AS bin_x,
       |             CAST(round(y/400.0)*400 AS BIGINT) AS bin_y, id
       |      FROM pts),
       |o AS (SELECT bin_x, bin_y,
       |             row_number() OVER (ORDER BY bin_x, bin_y, id) - 1 AS off
       |      FROM b WHERE kind = 3),
       |g AS (SELECT kind, bin_x, bin_y, count(*) AS np,
       |             min(id) AS lo, max(id) AS hi
       |      FROM b WHERE kind < 3 GROUP BY 1,2,3
       |      UNION ALL
       |      SELECT 3 AS kind, bin_x, bin_y, count(*) AS np,
       |             min(off) AS lo, max(off) AS hi
       |      FROM o GROUP BY 2,3)
       |SELECT bin_x, bin_y, CAST(sum(np) AS BIGINT) AS n_points,
       |       min(lo) AS id_min, max(hi) AS id_max,
       |       count(*) AS n_sources
       |FROM g GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  /** 66h-compose: the reference's PRODUCTION loop over genuine `.h5`
    * inputs, end to end (run_tile_updates + cross_ATL06_tile.py:45-87
    * + geo_index.py:679): track points land as ATL06 granules (one
    * track per granule:beam, the `file:pair` convention); a
    * positional geo index is saved and queried; the matched runs
    * drive a SLICED granule read; the recovered tracks feed the
    * crossover search; the crossings persist through the write_xovers
    * tile sink and read back tile-pruned.  The oracle recomputes the
    * crossings straight from parquet, so the hash match proves the
    * container layer composes with the analytic layer bit-exactly.
    */
  def h5Pipeline(s: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("h5pipe").toString
    val tr = Tables.eventsTracks(s, dir)
    // one track = one (granule, beam): sid ≡ track (mod 6) pins the
    // beam, sid increases with seq so beam arrays stay track-ordered
    val enc = tr.select(
      (col("track") / 6).cast("long").as("gran"),
      (col("seq") * 6 + col("track") % 6).as("id"),
      col("y").as("latitude"), col("x").as("longitude"),
      col("z").as("h_li"), col("t").cast("double").as("delta_time"))
    Atl06H5.writeGranules(enc, out)
    // positional run index over the track bins (pos = seq-1 within
    // each beam), saved in the reference's index-file layout
    val positioned = tr.select(
      (col("track") / 6).cast("long").as("gran"),
      (col("track") % 6).as("beam6"),
      (col("seq") - 1).as("pos"),
      GeoOps.binOf(col("x"), 400.0).as("bin_x"),
      GeoOps.binOf(col("y"), 400.0).as("bin_y"))
      .withColumn("file_num", col("gran") * 6 + col("beam6"))
    val runs = islandRuns(positioned)
    val fileEntries =
      for (g <- 0 to 1; b <- beams) yield (s"${granFile(g)}:$b", "ATL06")
    val idxPath = s"$out/index.h5"
    GeoIndexH5.write(runs, 400.0, "+proj=stere +lat_0=-90", "/data",
      fileEntries, idxPath)
    // query the index (full-domain box here; q_h5_run_read pins the
    // pruned-box case) → per-file:beam runs → sliced decode
    val matched = GeoIndexH5.readRuns(s, idxPath)
      .select("file_num", "offset_start", "offset_end").collect()
    val segs = Atl06H5.readRuns(s, out, assembleRuns(matched))
    // recover (track, seq) from the id ≡ track (mod 6) encoding
    val tracks = segs.select(
      (regexp_extract(col("file"), "ATL06_gran(\\d+)", 1).cast("long") * 6 +
        col("segment_id") % 6).as("track"),
      (col("segment_id") / 6).cast("long").as("seq"),
      col("longitude").as("x"), col("latitude").as("y"),
      col("h_li").as("z"), col("delta_time").as("t"))
    val xo = Crossovers.crossoversOf(tracks)
    val sink = s"$out/xovers"
    Crossovers.writeXovers(xo, sink)
    // tile-pruned read-back (the partition predicate prunes files)
    Crossovers.readXovers(s, sink)
      .filter(col("tile_e").between(0L, 100000L) &&
        col("tile_n").between(-100000L, 100000L))
      .select("track_a", "track_b", "seq_a", "seq_b", "xc", "yc", "dh")
      .orderBy("track_a", "track_b", "seq_a", "seq_b")
  }

  val h5PipelineSql: String =
    s"""WITH xo AS (${Crossovers.crossoversSql})
       |SELECT track_a, track_b, seq_a, seq_b, xc, yc, dh FROM xo
       |WHERE floor(xc/500.0)*500 BETWEEN 0 AND 100000
       |  AND floor(yc/500.0)*500 BETWEEN -100000 AND 100000
       |ORDER BY track_a, track_b, seq_a, seq_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_atl06_h5" -> (atl06Roundtrip _),
    "q_h5_index" -> (h5IndexRoundtrip _),
    "q_h5_dem" -> (h5Dem _),
    "q_h5_run_read" -> (h5RunRead _),
    "q_atl11_h5" -> (atl11Roundtrip _),
    "q_indexed_h5" -> (indexedH5Roundtrip _),
    "q_indexed_h5_read" -> (indexedH5Read _),
    "q_matlab_h5" -> (matlabH5Read _),
    "q_qfit_h5" -> (qfitH5Roundtrip _),
    "q_master_index" -> (masterIndex _),
    "q_mixed_index" -> (mixedIndex _),
    "q_h5_pipeline" -> (h5Pipeline _))

  val oracles: Map[String, String] = Map(
    "q_atl06_h5" -> atl06RoundtripSql,
    "q_h5_index" -> h5IndexRoundtripSql,
    "q_h5_dem" -> DateOps.gridInterpSql,
    "q_h5_run_read" -> h5RunReadSql,
    "q_atl11_h5" -> atl11RoundtripSql,
    "q_indexed_h5" -> indexedH5RoundtripSql,
    "q_indexed_h5_read" -> indexedH5ReadSql,
    "q_matlab_h5" -> matlabH5ReadSql,
    "q_qfit_h5" -> qfitH5RoundtripSql,
    "q_master_index" -> masterIndexSql,
    "q_mixed_index" -> mixedIndexSql,
    "q_h5_pipeline" -> h5PipelineSql)
}
