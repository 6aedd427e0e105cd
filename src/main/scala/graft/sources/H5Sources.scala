package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

import graft.sources.Hdf5.{NumAttr, StrAttr}

/** ATL06 granule IO over the self-contained HDF5 codec — the Spark
  * face of the reference's primary point format (ATL06_data.py:92
  * `from_file`: per-beam groups `gt{1..3}{l,r}/land_ice_segments`
  * holding parallel 1-D arrays).
  *
  * Scale shape: one granule = one `.h5` file = one ICESat-2 pass —
  * bounded by construction (~1e5 segments), so granules encode in
  * `mapPartitions` after a repartition on the granule key and decode
  * through the `binaryFile` source, one file per task unit; a
  * 10⁶-granule archive is embarrassingly parallel and nothing
  * granule-sized ever reaches the driver.
  */
object Atl06H5 {

  /** One land-ice segment as read back from a granule. */
  final case class Seg(file: String, beam_pair: Int, lr: Int, segment_id: Long,
                       latitude: Double, longitude: Double, h_li: Double,
                       delta_time: Double)

  private def beamGroup(pair: Int, lr: Int): String =
    s"gt$pair${if (lr == 0) "l" else "r"}"

  /** Encode one granule.  Beam assignment follows the reference's
    * fixed six-beam structure (ATL06_data.py:96 `gt%d%s`); the field
    * set is the reference's default-dict core (ATL06_data.py:77:
    * latitude, longitude, h_li, delta_time + segment ids).  Datasets
    * deliberately span the codec's layout matrix: chunked+deflate,
    * chunked+shuffle+deflate, chunked+deflate+fletcher32, contiguous.
    */
  def granuleBytes(recs: Seq[(Long, Double, Double, Double, Double)],
                   rgt: Long): Array[Byte] = {
    val w = new Hdf5.Writer
    w.attrL("", "rgt", rgt)
    w.longs("/orbit_info/rgt", Array(rgt))
    w.longs("/orbit_info/orbit_number", Array(rgt * 14 + 1))
    for (pair <- 1 to 3; lr <- 0 to 1) {
      val beam = recs.filter { case (id, _, _, _, _) =>
        ((id % 6) / 2).toInt + 1 == pair && (id % 2).toInt == lr
      }.sortBy(_._1)
      val g = s"/${beamGroup(pair, lr)}/land_ice_segments"
      val n = beam.size
      val rows = Hdf5.chunkRowsFor(n)
      w.longs(s"$g/segment_id", beam.map(_._1).toArray, chunkRows = rows, gzip = 6)
      w.doubles(s"$g/latitude", beam.map(_._2).toArray, chunkRows = rows, gzip = 6,
        shuffle = true)
      w.doubles(s"$g/longitude", beam.map(_._3).toArray, chunkRows = rows, gzip = 6)
      w.doubles(s"$g/h_li", beam.map(_._4).toArray)
      w.doubles(s"$g/delta_time", beam.map(_._5).toArray, chunkRows = rows,
        gzip = 6, fletcher = true)
      w.attrD(s"$g/h_li", "_FillValue", 3.4028234663852886e38)
    }
    w.toBytes
  }

  /** The reference's default field set (ATL06_data.py:77). */
  val AllFields: Set[String] = Set("latitude", "longitude", "h_li", "delta_time")

  /** Decode one granule's beams (ATL06_data.py:107-171 reads the same
    * parallel arrays per beam and column-binds them).
    *
    * `runsByBeam` is the reference's `index_range` read path
    * (get_data_for_geo_index, geo_index.py:537-541: each matched
    * `[offset_start, offset_end]` run slices the beam's arrays): when
    * given, ONLY the element runs listed for each beam group (e.g.
    * `gt2l`) decode — and via [[Hdf5.Reader.readRawRuns]] only the
    * CHUNKS overlapping those runs inflate.  Beams absent from the
    * map yield nothing; runs are inclusive, sorted, disjoint.
    *
    * `fields` is the reference's `field_dict` subsetting
    * (ATL06_data.py:27-47): datasets not requested are never decoded
    * — their columns come back NaN.  `segment_id` always reads (it
    * is the record identity).
    */
  /** Granule decodes since JVM start — a test observable (local mode
    * shares the JVM) proving streaming batches decode each granule
    * exactly once ([[graft.streaming.EventStream.ingestGranules]]).
    */
  val decodeCount = new java.util.concurrent.atomic.AtomicLong(0L)

  def decode(file: String, bytes: Array[Byte],
             runsByBeam: Option[Map[String, Seq[(Long, Long)]]] = None,
             fields: Option[Set[String]] = None): Iterator[Seg] = {
    decodeCount.incrementAndGet()
    decodeWith(file, new Hdf5.Reader(bytes), runsByBeam, fields)
  }

  /** [[decode]] over a caller-supplied Reader — lets specs observe
    * `Reader.chunksDecoded` to prove slicing/subsetting skips work.
    */
  def decodeWith(file: String, r: Hdf5.Reader,
                 runsByBeam: Option[Map[String, Seq[(Long, Long)]]],
                 fields: Option[Set[String]]): Iterator[Seg] = {
    val ds = r.datasets.toSet
    val want = fields.getOrElse(AllFields)
    (for (pair <- 1 to 3; lr <- 0 to 1) yield {
      val bg = beamGroup(pair, lr)
      val g = s"/$bg/land_ice_segments"
      val runs = runsByBeam match {
        case Some(m) => m.get(bg) match {
          case Some(rs) if rs.nonEmpty => Some(rs)
          case _ => None // beam not matched by the query — skip it
        }
        case None => Some(Seq.empty) // no slicing: whole beam
      }
      if (!ds.contains(s"$g/segment_id") || runs.isEmpty) Iterator.empty
      else {
        val rs = runs.get
        def dbls(name: String, n: Int): Array[Double] =
          if (!want(name)) Array.fill(n)(Double.NaN)
          else if (rs.nonEmpty) r.readDoublesRuns(s"$g/$name", rs)
          else r.readDoubles(s"$g/$name")
        val ids =
          if (rs.nonEmpty) r.readLongsRuns(s"$g/segment_id", rs)
          else r.readLongs(s"$g/segment_id")
        val lat = dbls("latitude", ids.length)
        val lon = dbls("longitude", ids.length)
        val h = dbls("h_li", ids.length)
        val dt = dbls("delta_time", ids.length)
        ids.indices.iterator.map(i =>
          Seg(file, pair, lr, ids(i), lat(i), lon(i), h(i), dt(i)))
      }
    }).iterator.flatten
  }

  /** Write points as ATL06-shaped granules, one file per `gran` key,
    * encoded on executors and written through the Hadoop FileSystem
    * API.  Input columns: gran, id, latitude, longitude, h_li,
    * delta_time.
    */
  def writeGranules(points: DataFrame, dir: String): Unit = {
    val spark = points.sparkSession
    import spark.implicits._
    val hconf = spark.sparkContext.broadcast(
      new SerHadoopConf(spark.sparkContext.hadoopConfiguration))
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(dirPath)
    points
      .select(col("gran").cast("long"), col("id").cast("long"),
        col("latitude").cast("double"), col("longitude").cast("double"),
        col("h_li").cast("double"), col("delta_time").cast("double"))
      .repartition(col("gran"))
      .sortWithinPartitions("gran", "id")
      .as[(Long, Long, Double, Double, Double, Double)]
      .mapPartitions { it =>
        // sorted input + streaming groups: one granule on the heap at
        // a time, however many granules hash into this partition
        GranuleGroups.byKey(it)(_._1).map { case (gran, rows) =>
          val bytes = granuleBytes(
            rows.map(r => (r._2, r._3, r._4, r._5, r._6)), gran)
          val p = new org.apache.hadoop.fs.Path(f"$dir/ATL06_gran$gran%04d.h5")
          val fs = p.getFileSystem(hconf.value.conf)
          val os = fs.create(p, true)
          try os.write(bytes) finally os.close()
          gran
        }
      }
      .write.format("noop").mode("overwrite").save()
  }

  /** Read a directory of granules back as the segment table. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", "*.h5").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, c) => decode(p, c) }
      .toDF()
  }

  /** Run-sliced granule read — the reference's core query read path
    * (get_data_for_geo_index, geo_index.py:494-572): `runsByFile`
    * maps granule file NAME → beam group (`gt2l`) → inclusive
    * `[offset_start, offset_end]` element runs, exactly the shape a
    * matched geo index yields.  Only the listed files open, only the
    * listed beams decode, and only the chunks overlapping the runs
    * inflate.  The run map is index-derived (manifest-sized — the
    * reference holds the same dict in memory); it broadcasts, and the
    * per-granule decode stays an executor-side task unit.
    */
  def readRuns(spark: SparkSession, dir: String,
               runsByFile: Map[String, Map[String, Seq[(Long, Long)]]],
               fields: Option[Set[String]] = None): DataFrame = {
    import spark.implicits._
    if (runsByFile.isEmpty) return spark.emptyDataset[Seg].toDF()
    val bc = spark.sparkContext.broadcast(runsByFile)
    val paths = runsByFile.keys.map(f => s"$dir/$f").toSeq
    spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, c) =>
        val name = p.substring(p.lastIndexOf('/') + 1)
        bc.value.get(name) match {
          case Some(byBeam) => decode(p, c, Some(byBeam), fields)
          case None => Iterator.empty
        }
      }
      .toDF()
  }

  /** Registry adapter: the lat/lon-bearing reader contract
    * (rec_idx, latitude, longitude, elevation, rel_time_s).
    */
  def readForRegistry(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir).select(
      col("segment_id").as("rec_idx"), col("latitude"), col("longitude"),
      col("h_li").as("elevation"), col("delta_time").as("rel_time_s"))
}

/** ATL11 granule IO — the reference's second HDF5 point format
  * (geo_index.py:245-255 `for_file('ATL11')`): per-beam-pair groups
  * `pt{1..3}` each holding a `corrected_h` group of parallel arrays
  * (the reference's field dict reads latitude/longitude from it).
  * Same granule-per-task scale shape as [[Atl06H5]].
  */
object Atl11H5 {

  final case class Pt(file: String, beam_pair: Int, ref_pt: Long,
                      latitude: Double, longitude: Double, h_corr: Double,
                      delta_time: Double)

  def granuleBytes(recs: Seq[(Long, Double, Double, Double, Double)]): Array[Byte] = {
    val w = new Hdf5.Writer
    for (pair <- 1 to 3) {
      val beam = recs.filter { case (id, _, _, _, _) => id % 3 == pair - 1 }
        .sortBy(_._1)
      val g = s"/pt$pair/corrected_h"
      val rows = Hdf5.chunkRowsFor(beam.size)
      w.longs(s"$g/ref_pt", beam.map(_._1).toArray, chunkRows = rows, gzip = 6)
      w.doubles(s"$g/latitude", beam.map(_._2).toArray, chunkRows = rows, gzip = 6)
      w.doubles(s"$g/longitude", beam.map(_._3).toArray, chunkRows = rows, gzip = 6)
      w.doubles(s"$g/h_corr", beam.map(_._4).toArray, chunkRows = rows, gzip = 6,
        shuffle = true)
      w.doubles(s"$g/delta_time", beam.map(_._5).toArray)
    }
    w.toBytes
  }

  val AllFields: Set[String] = Set("latitude", "longitude", "h_corr", "delta_time")

  /** Decode, with the same `index_range` run-slicing and field_dict
    * subsetting as [[Atl06H5.decode]] (the reference's ATL11 arm,
    * geo_index.py:542-548, slices `pt{pair}` groups identically).
    * `runsByGroup` keys are `pt1`/`pt2`/`pt3`.
    */
  def decode(file: String, bytes: Array[Byte],
             runsByGroup: Option[Map[String, Seq[(Long, Long)]]] = None,
             fields: Option[Set[String]] = None): Iterator[Pt] =
    decodeWith(file, new Hdf5.Reader(bytes), runsByGroup, fields)

  def decodeWith(file: String, r: Hdf5.Reader,
                 runsByGroup: Option[Map[String, Seq[(Long, Long)]]],
                 fields: Option[Set[String]]): Iterator[Pt] = {
    val ds = r.datasets.toSet
    val want = fields.getOrElse(AllFields)
    (for (pair <- 1 to 3) yield {
      val g = s"/pt$pair/corrected_h"
      val runs = runsByGroup match {
        case Some(m) => m.get(s"pt$pair") match {
          case Some(rs) if rs.nonEmpty => Some(rs)
          case _ => None
        }
        case None => Some(Seq.empty)
      }
      if (!ds.contains(s"$g/ref_pt") || runs.isEmpty) Iterator.empty
      else {
        val rs = runs.get
        def dbls(name: String, n: Int): Array[Double] =
          if (!want(name)) Array.fill(n)(Double.NaN)
          else if (rs.nonEmpty) r.readDoublesRuns(s"$g/$name", rs)
          else r.readDoubles(s"$g/$name")
        val ids =
          if (rs.nonEmpty) r.readLongsRuns(s"$g/ref_pt", rs)
          else r.readLongs(s"$g/ref_pt")
        val lat = dbls("latitude", ids.length)
        val lon = dbls("longitude", ids.length)
        val h = dbls("h_corr", ids.length)
        val dt = dbls("delta_time", ids.length)
        ids.indices.iterator.map(i =>
          Pt(file, pair, ids(i), lat(i), lon(i), h(i), dt(i)))
      }
    }).iterator.flatten
  }

  /** Input columns: gran, id, latitude, longitude, h_corr, delta_time. */
  def writeGranules(points: DataFrame, dir: String): Unit = {
    val spark = points.sparkSession
    import spark.implicits._
    val hconf = spark.sparkContext.broadcast(
      new SerHadoopConf(spark.sparkContext.hadoopConfiguration))
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(dirPath)
    points
      .select(col("gran").cast("long"), col("id").cast("long"),
        col("latitude").cast("double"), col("longitude").cast("double"),
        col("h_corr").cast("double"), col("delta_time").cast("double"))
      .repartition(col("gran"))
      .sortWithinPartitions("gran", "id")
      .as[(Long, Long, Double, Double, Double, Double)]
      .mapPartitions { it =>
        GranuleGroups.byKey(it)(_._1).map { case (gran, rows) =>
          val bytes = granuleBytes(rows.map(r => (r._2, r._3, r._4, r._5, r._6)))
          val p = new org.apache.hadoop.fs.Path(f"$dir/ATL11_gran$gran%04d.h5")
          val fs = p.getFileSystem(hconf.value.conf)
          val os = fs.create(p, true)
          try os.write(bytes) finally os.close()
          gran
        }
      }
      .write.format("noop").mode("overwrite").save()
  }

  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", "*.h5").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, c) => decode(p, c) }
      .toDF()
  }

  /** Run-sliced read, shape-identical to [[Atl06H5.readRuns]] with
    * `pt{1..3}` group keys.
    */
  def readRuns(spark: SparkSession, dir: String,
               runsByFile: Map[String, Map[String, Seq[(Long, Long)]]],
               fields: Option[Set[String]] = None): DataFrame = {
    import spark.implicits._
    if (runsByFile.isEmpty) return spark.emptyDataset[Pt].toDF()
    val bc = spark.sparkContext.broadcast(runsByFile)
    val paths = runsByFile.keys.map(f => s"$dir/$f").toSeq
    spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, c) =>
        val name = p.substring(p.lastIndexOf('/') + 1)
        bc.value.get(name) match {
          case Some(byGroup) => decode(p, c, Some(byGroup), fields)
          case None => Iterator.empty
        }
      }
      .toDF()
  }

  def readForRegistry(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir).select(
      col("ref_pt").as("rec_idx"), col("latitude"), col("longitude"),
      col("h_corr").as("elevation"), col("delta_time").as("rel_time_s"))
}

/** The reference's saved-index file format (geo_index.py:205-229
  * `to_file`): an `index` group whose attrs carry `delta`,
  * `SRS_proj4`, `dir_root`, `n_files` and per-file `file_N`/`type_N`,
  * and one subgroup per bin (named from the bin center, `x_y`)
  * holding the parallel run arrays `file_num`, `offset_start`,
  * `offset_end`.  [[adopt]] is the `for_file('h5_geoindex')` arm
  * (geo_index.py:275-289): the saved bins are taken over WITHOUT a
  * point scan.
  */
object GeoIndexH5 {

  final case class Run(bin_x: Long, bin_y: Long, file_num: Long,
                       offset_start: Long, offset_end: Long)

  /** Build the reference-shaped index file from a run table
    * `(bin_x, bin_y, run_start, run_end)`.  An index is
    * manifest-sized (bins × runs, no point data), so the build
    * collects the run table — the same O(index) driver footprint as
    * the reference's in-memory geo_index dict — and the result is a
    * single `.h5` exactly like `to_file`'s.
    */
  def write(runs: DataFrame, delta: Double, srsProj4: String, dirRoot: String,
            files: Seq[(String, String)], path: String): Unit = {
    val collected = runs
      .select(col("bin_x").cast("long"), col("bin_y").cast("long"),
        coalesce(col("file_num"), lit(0L)).cast("long"),
        col("run_start").cast("long"), col("run_end").cast("long"))
      .collect()
      .map(r => Run(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val w = new Hdf5.Writer
    w.group("/index")
    w.attrD("/index", "delta", delta)
    w.attrS("/index", "SRS_proj4", srsProj4)
    w.attrS("/index", "dir_root", dirRoot)
    w.attrL("/index", "n_files", files.size.toLong)
    files.zipWithIndex.foreach { case ((f, t), i) =>
      w.attrS("/index", s"file_$i", f)
      w.attrS("/index", s"type_$i", t)
    }
    collected.groupBy(r => (r.bin_x, r.bin_y)).toSeq.sortBy(_._1).foreach {
      case ((bx, by), rs0) =>
        val rs = rs0.sortBy(_.offset_start)
        val g = s"/index/${bx}_$by"
        w.longs(s"$g/file_num", rs.map(_.file_num))
        w.longs(s"$g/offset_start", rs.map(_.offset_start))
        w.longs(s"$g/offset_end", rs.map(_.offset_end))
    }
    val p = new org.apache.hadoop.fs.Path(path)
    // resolve the FS from the session's hadoopConfiguration (as
    // attrs/readRuns do) so spark.hadoop.* settings — s3a creds,
    // defaultFS overrides — govern writes and reads symmetrically
    val fs = p.getFileSystem(runs.sparkSession.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try os.write(w.toBytes) finally os.close()
  }

  /** Explode a saved index file into its run table, decoded on an
    * executor via the binaryFile source (reference files name bins
    * with float-formatted centers — both `400` and `400.0` parse).
    */
  def readRuns(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap { bytes =>
        val r = new Hdf5.Reader(bytes)
        r.groups.filter(g => g.startsWith("/index/") && g.count(_ == '/') == 2)
          .iterator.flatMap { g =>
            val name = g.stripPrefix("/index/")
            val sep = name.lastIndexOf('_')
            val bx = math.round(name.substring(0, sep).toDouble)
            val by = math.round(name.substring(sep + 1).toDouble)
            val fn = r.readLongs(s"$g/file_num")
            val s0 = r.readLongs(s"$g/offset_start")
            val s1 = r.readLongs(s"$g/offset_end")
            fn.indices.map(i => Run(bx, by, fn(i), s0(i), s1(i)))
          }
      }
      .toDF()
  }

  /** `for_file('h5_geoindex')`: adopt the saved bins as a partial
    * index (registry schema) with NO point scan — `n_points` from the
    * run extents, min/max ids from the runs.
    */
  def adopt(spark: SparkSession, path: String): DataFrame =
    readRuns(spark, path)
      .groupBy("bin_x", "bin_y")
      .agg((sum(col("offset_end") - col("offset_start") + 1)).cast("long").as("n_points"),
        min("offset_start").as("id_min"), max("offset_end").as("id_max"))

  def attrs(spark: SparkSession, path: String): Map[String, String] = {
    // Hadoop-FS read (scheme-aware, like write) — an index file is
    // manifest-sized, so a driver-side read is metadata, not data
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(bytes) finally in.close()
    new Hdf5.Reader(bytes).attrs("/index").collect {
      case (k, StrAttr(ss)) => k -> ss.headOption.getOrElse("")
      case (k, NumAttr(ds, _)) => k -> ds.headOption.map(_.toString).getOrElse("")
    }.toMap
  }

  /** `change_root` (geo_index.py:193-204, the repair fix_dir_root.py
    * scripts by hand): every `file_N` attr is re-based — absolutized
    * against the OLD `dir_root`, then the NEW root stripped as a
    * leading PREFIX — and `dir_root` becomes the new root.  The
    * reference's str.replace strips the root wherever it occurs,
    * which corrupts paths whose FILENAME happens to contain the root
    * string; an anchored strip is identical on every layout the
    * reference handles and correct on that corner too.  The index
    * file is manifest-sized, so the rewrite is a read → transform →
    * rewrite of one small file; the bins and runs are byte-preserved.
    */
  def changeRoot(spark: SparkSession, path: String, newRoot: String): Unit = {
    val at = attrs(spark, path)
    val oldRoot = at.getOrElse("dir_root", "").replace("//", "/")
    val nr = newRoot.replace("//", "/")
    val n = at.get("n_files").map(_.toDouble.toInt).getOrElse(0)
    val files = (0 until n).map { i =>
      val f = at.getOrElse(s"file_$i", "")
      val abs = oldRoot + f
      val rebased = if (nr.nonEmpty && abs.startsWith(nr)) abs.substring(nr.length) else abs
      (rebased, at.getOrElse(s"type_$i", ""))
    }
    val runs = readRuns(spark, path)
      .withColumnRenamed("offset_start", "run_start")
      .withColumnRenamed("offset_end", "run_end")
      .select("bin_x", "bin_y", "file_num", "run_start", "run_end")
      .localCheckpoint() // materialize BEFORE the overwrite below
    write(runs, at.get("delta").map(_.toDouble).getOrElse(0.0),
      at.getOrElse("SRS_proj4", ""), nr, files, path)
  }
}

/** The reference's `indexed_h5` family (geo_index.py:289-315
  * `for_file('indexed_h5')`): a data file carrying its own spatial
  * inventory.  Three sub-shapes, all adopted WITHOUT scanning point
  * datasets: an `INDEX` group with `bin_x`/`bin_y` centers plus a
  * 2×N `bin_index` of first/last row offsets; an `INDEX` group with
  * centers only (offsets unknown — the reference's
  * `fake_offset_val=-1`); or no index at all, just `{x}E_{y}N` bin
  * groups whose names carry the centers.
  */
object IndexedH5 {

  final case class BinRow(bin_x: Long, bin_y: Long, n_points: Option[Long],
                          id_min: Long, id_max: Long)

  private val BinRe = "(.*)E_(.*)N".r

  /** End-convention of a foreign `bin_index`: `Auto` infers from the
    * file (see the convention note below), `Inclusive`/`Exclusive`
    * pin it explicitly — the escape hatch for the one genuinely
    * ambiguous shape, a foreign EXCLUSIVE-end file whose bins stop
    * short of the last data row (auto-inference reads it as
    * inclusive, one extra row per bin; adoption logs a warning when
    * it detects the ambiguity).
    */
  sealed trait EndConvention extends Serializable
  case object Auto extends EndConvention
  case object Inclusive extends EndConvention
  case object Exclusive extends EndConvention

  private lazy val log =
    org.slf4j.LoggerFactory.getLogger("graft.sources.IndexedH5")

  def adopt(spark: SparkSession, path: String,
            ends: EndConvention = Auto): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap { bytes =>
        val r = new Hdf5.Reader(bytes)
        val ds = r.datasets.toSet
        if (ds.contains("/INDEX/bin_x")) {
          val bx = r.readDoubles("/INDEX/bin_x")
          val by = r.readDoubles("/INDEX/bin_y")
          if (ds.contains("/INDEX/bin_index")) {
            // 2×N row-major: row 0 = first offsets, row 1 = last.
            // ON-DISK END CONVENTION, decided deliberately: graft
            // writes INCLUSIVE [first,last] (writeIndexed), which its
            // own readData round-trips.  The reference ecosystem's
            // producers store EXCLUSIVE ends (read_indexed_h5_file
            // slices h5f[field][i0:i1], geo_index.py:617-629 — note
            // the reference's own from_xy computes inclusive lasts,
            // so the reference is internally off-by-one; graft is
            // not).  Adoption normalizes: when the max end equals a
            // data dataset's ROW COUNT the file is exclusive-end and
            // ends shift down by one; max end == rows-1 is graft's
            // inclusive convention.  A foreign exclusive file whose
            // bins stop short of the last row is indistinguishable
            // under Auto — adoption WARNS on that ambiguous shape
            // (maxEnd short of both markers) and callers who know
            // their producer pin `ends = Inclusive/Exclusive`.
            val fl = r.readLongs("/INDEX/bin_index")
            val n = fl.length / 2
            val rows = ds.find(d => !d.startsWith("/INDEX"))
              .map(d => r.dims(d).product)
            val maxEnd = if (n == 0) -1L else (0 until n).map(i => fl(n + i)).max
            val endAdj = ends match {
              case Inclusive => 0L
              case Exclusive => 1L
              case Auto =>
                if (n > 0 && rows.exists(rc => maxEnd < rc - 1))
                  log.warn(s"indexed_h5 adoption: max bin end $maxEnd stops " +
                    s"short of the data (rows=${rows.get}) — end convention " +
                    "is ambiguous, assuming graft-inclusive; pass " +
                    "ends=Inclusive/Exclusive if this file's producer is known")
                if (rows.contains(maxEnd)) 1L else 0L
            }
            (0 until n).iterator.map { i =>
              BinRow(math.round(bx(i)), math.round(by(i)),
                Some(fl(n + i) - endAdj - fl(i) + 1), fl(i), fl(n + i) - endAdj)
            }
          } else
            bx.indices.iterator.map(i =>
              BinRow(math.round(bx(i)), math.round(by(i)), None, -1L, -1L))
        } else
          // bare bin groups: "{x}E_{y}N" names carry the centers
          r.groups.iterator.collect {
            case g if BinRe.pattern.matcher(g.stripPrefix("/")).matches() &&
              !g.stripPrefix("/").contains("/") =>
              val BinRe(xs, ys) = g.stripPrefix("/")
              BinRow(math.round(xs.toDouble), math.round(ys.toDouble),
                None, -1L, -1L)
          }
      }
      .toDF()
      .select(col("bin_x"), col("bin_y"), col("n_points"),
        col("id_min"), col("id_max"))
  }

  /** The matlab-written variant (geo_index.py:318-326
    * `for_file('indexed_h5_from_matlab')`): adoption reads the
    * `INDEX` centers ONLY and never trusts offsets — the reference
    * passes `fake_offset_val=-1` unconditionally, even when a
    * `bin_index` dataset happens to exist.
    */
  def adoptMatlab(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap { bytes =>
        val r = new Hdf5.Reader(bytes)
        val bx = r.readDoubles("/INDEX/bin_x")
        val by = r.readDoubles("/INDEX/bin_y")
        bx.indices.iterator.map(i =>
          BinRow(math.round(bx(i)), math.round(by(i)), None, -1L, -1L))
      }
      .toDF()
      .select(col("bin_x"), col("bin_y"), col("n_points"),
        col("id_min"), col("id_max"))
  }

  /** Point DATA out of a self-indexed file — the reference's
    * `read_indexed_h5_file` (geo_index.py:605-665), both arms:
    *
    *  - `runs` (the `bin_index` shape, :612-629): inclusive
    *    `[first,last]` row runs sliced out of contiguous whole-file
    *    datasets.  The chunk B-tree prunes, so only chunks
    *    overlapping the runs inflate — the `.h5` analog of the
    *    parquet side's manifest pruning.
    *  - `bins` (the distinct-bin shape, :630-642): per-bin lookups
    *    against `{x}E_{y}N` names, trying the field-major layout
    *    (`h5f[field][bin]`) then the bin-major one
    *    (`h5f[bin][field]`) per field, exactly the reference's
    *    probe order.  `fromMatlab` applies the matlab arm's km
    *    naming (geo_index.py:570 `result['x']/1000`).
    *
    * Fields absent from a file yield null columns (the reference's
    * `blank_fields`).  One file = one task unit via binaryFile; the
    * run/bin lists are index-derived and manifest-sized, so they ride
    * the closure.
    */
  def readData(spark: SparkSession, path: String, fields: Seq[String],
               runs: Seq[(Long, Long)] = Seq.empty,
               bins: Seq[(Long, Long)] = Seq.empty,
               fromMatlab: Boolean = false): DataFrame = {
    require(runs.isEmpty != bins.isEmpty,
      "exactly one of runs (bin_index shape) or bins (distinct-bin shape)")
    val schema = StructType(StructField("file", StringType, nullable = false) +:
      fields.map(f => StructField(f, DoubleType, nullable = true)))
    val sortedRuns = runs.sortBy(_._1)
    val binNames = bins.map { case (bx, by) =>
      if (fromMatlab) s"${bx / 1000}E_${by / 1000}N" else s"${bx}E_${by}N"
    }
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])](
        Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .flatMap { case (p, bytes) =>
        val name = p.substring(p.lastIndexOf('/') + 1)
        val r = new Hdf5.Reader(bytes)
        val have = r.datasets.toSet
        def rowsOf(where: String, cols: Seq[Option[Array[Double]]]): Iterator[Row] = {
          // a ragged (malformed) file must surface as a named error, not
          // an executor-side AIOOBE mid-iterator — the reference
          // concatenates fields independently and would silently misalign
          val lens = fields.zip(cols).collect { case (f, Some(a)) => (f, a.length) }
          if (lens.map(_._2).distinct.length > 1)
            throw new IllegalStateException(
              s"ragged field lengths in $name at $where: " +
                lens.map { case (f, n) => s"$f=$n" }.mkString(", "))
          val n = lens.headOption.map(_._2).getOrElse(0)
          Iterator.range(0, n).map { i =>
            Row.fromSeq(name +: cols.map {
              case Some(a) => java.lang.Double.valueOf(a(i))
              case None => null
            })
          }
        }
        if (sortedRuns.nonEmpty)
          rowsOf("runs", fields.map { f =>
            if (have.contains(s"/$f"))
              Some(r.readDoublesRuns(s"/$f", sortedRuns))
            else None
          })
        else
          // per-BIN row assembly: a field present for some bins but
          // absent for others must not shift later bins' values onto
          // earlier rows — each bin zips only its own arrays, and a
          // missing (field, bin) pair yields nulls for that bin alone
          binNames.iterator.flatMap { bn =>
            rowsOf(s"bin $bn", fields.map { f =>
              if (have.contains(s"/$f/$bn")) Some(r.readDoubles(s"/$f/$bn"))
              else if (have.contains(s"/$bn/$f")) Some(r.readDoubles(s"/$bn/$f"))
              else None
            })
          }
      }(Encoders.row(schema))
  }

  /** Write the `bin_index` shape the reference indexes
    * (geo_index.py:289-299): whole-file contiguous field datasets
    * sorted by (bin, order), plus the `INDEX` group with centers and
    * the 2×N first/last row offsets — INCLUSIVE [first,last], the
    * convention [[readData]] round-trips and [[adopt]] detects
    * (foreign exclusive-end files normalize on adoption; see the
    * convention note there).  One file per `gran` key,
    * encoded executor-side (the streaming-group writer pattern);
    * chunked+deflate datasets so [[readData]]'s run slicing has
    * chunks to prune.
    */
  def writeIndexed(points: DataFrame, dir: String, delta: Double,
                   fields: Seq[String] = Seq("x", "y", "z", "time")): Unit = {
    val spark = points.sparkSession
    import spark.implicits._
    val hconf = spark.sparkContext.broadcast(
      new SerHadoopConf(spark.sparkContext.hadoopConfiguration))
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(dirPath)
    val arr = array(fields.map(f => col(f).cast("double")): _*)
    points
      .select(col("gran").cast("long"),
        graft.operators.GeoOps.binOf(col("x"), delta).as("bin_x"),
        graft.operators.GeoOps.binOf(col("y"), delta).as("bin_y"),
        col("ord").cast("long"), arr.as("vals"))
      .repartition(col("gran"))
      .sortWithinPartitions("gran", "bin_x", "bin_y", "ord")
      .as[(Long, Long, Long, Long, Seq[Double])]
      .mapPartitions { it =>
        GranuleGroups.byKey(it)(_._1).map { case (gran, rows) =>
          val w = new Hdf5.Writer
          // chunk count must fit the writer's B-tree capacity at any
          // granule size (the Atl06 sizing rule)
          val chunkRows = Hdf5.chunkRowsFor(rows.size)
          fields.zipWithIndex.foreach { case (f, fi) =>
            w.doubles(s"/$f", rows.map(_._5(fi)).toArray,
              chunkRows = chunkRows, gzip = 6, shuffle = true)
          }
          // per-bin first/last over the (bin-sorted) row order
          val binsOrdered = rows.map(r => (r._2, r._3)).zipWithIndex
            .groupBy(_._1).toSeq.sortBy(_._1)
            .map { case (b, g) =>
              (b, g.map(_._2.toLong).min, g.map(_._2.toLong).max)
            }
          w.doubles("/INDEX/bin_x", binsOrdered.map(_._1._1.toDouble).toArray)
          w.doubles("/INDEX/bin_y", binsOrdered.map(_._1._2.toDouble).toArray)
          w.longs("/INDEX/bin_index",
            (binsOrdered.map(_._2) ++ binsOrdered.map(_._3)).toArray,
            dims = Seq(2L, binsOrdered.length.toLong))
          val p = new org.apache.hadoop.fs.Path(f"$dir/indexed_$gran%04d.h5")
          val fs = p.getFileSystem(hconf.value.conf)
          val os = fs.create(p, true)
          try os.write(w.toBytes) finally os.close()
          gran
        }
      }
      .write.format("noop").mode("overwrite").save()
  }

  /** Write the distinct-bin shape (geo_index.py:300-315): per-bin
    * datasets under `{x}E_{y}N` names.  To pin BOTH of the
    * reference's lookup arms, the first half of `fields` lands
    * field-major (`/{field}/{bin}`) and the rest bin-major
    * (`/{bin}/{field}`); `kmNames` writes matlab-convention km bin
    * names over meter centers.  The `INDEX` group carries centers
    * only — offsets are meaningless for this shape (the reference's
    * `fake_offset_val=-1`).
    */
  def writeBinGroups(points: DataFrame, dir: String, delta: Double,
                     fields: Seq[String] = Seq("x", "y", "z", "time"),
                     kmNames: Boolean = false): Unit = {
    val spark = points.sparkSession
    import spark.implicits._
    val hconf = spark.sparkContext.broadcast(
      new SerHadoopConf(spark.sparkContext.hadoopConfiguration))
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(dirPath)
    val arr = array(fields.map(f => col(f).cast("double")): _*)
    val nMajor = (fields.size + 1) / 2
    points
      .select(col("gran").cast("long"),
        graft.operators.GeoOps.binOf(col("x"), delta).as("bin_x"),
        graft.operators.GeoOps.binOf(col("y"), delta).as("bin_y"),
        col("ord").cast("long"), arr.as("vals"))
      .repartition(col("gran"))
      .sortWithinPartitions("gran", "bin_x", "bin_y", "ord")
      .as[(Long, Long, Long, Long, Seq[Double])]
      .mapPartitions { it =>
        GranuleGroups.byKey(it)(_._1).map { case (gran, rows) =>
          val w = new Hdf5.Writer
          val binsOrdered = GranuleGroups.byKey(rows.iterator)(r => (r._2, r._3)).toSeq
          binsOrdered.foreach { case ((bx, by), brs) =>
            val bn = if (kmNames) s"${bx / 1000}E_${by / 1000}N"
                     else s"${bx}E_${by}N"
            fields.zipWithIndex.foreach { case (f, fi) =>
              val path = if (fi < nMajor) s"/$f/$bn" else s"/$bn/$f"
              w.doubles(path, brs.map(_._5(fi)).toArray)
            }
          }
          w.doubles("/INDEX/bin_x", binsOrdered.map(_._1._1.toDouble).toArray)
          w.doubles("/INDEX/bin_y", binsOrdered.map(_._1._2.toDouble).toArray)
          val p = new org.apache.hadoop.fs.Path(f"$dir/bins_$gran%04d.h5")
          val fs = p.getFileSystem(hconf.value.conf)
          val os = fs.create(p, true)
          try os.write(w.toBytes) finally os.close()
          gran
        }
      }
      .write.format("noop").mode("overwrite").save()
  }
}

/** The reference's tiled global mask granule (read_surfmask.py:150:
  * `TILE_INDEX` attrs LAT0/LON0/…/NAME place each 400×400 tile on
  * the 0.05° grid; bit 0 of `surf_type` is the land flag).  One
  * granule decodes per executor task via binaryFile; each cell
  * becomes a (lat, lon, surf_type, land) row.
  */
object Surfmask {

  final case class Cell(tile: String, lat: Double, lon: Double,
                        surf_type: Long, land: Int)

  def read(spark: SparkSession, path: String, stride: Int = 1): DataFrame = {
    import spark.implicits._
    require(stride >= 1, "stride must be >= 1")
    spark.read.format("binaryFile").option("pathGlobFilter", "*.h5").load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap { bytes =>
        val r = new Hdf5.Reader(bytes)
        val ti = r.attrs("/TILE_INDEX")
        val names = ti("NAME").asInstanceOf[StrAttr].strings
        val lat0 = ti("LAT0").asInstanceOf[NumAttr].doubles
        val lon0 = ti("LON0").asInstanceOf[NumAttr].doubles
        val latS = ti("LAT_SCALE").asInstanceOf[NumAttr].doubles
        val lonS = ti("LON_SCALE").asInstanceOf[NumAttr].doubles
        val nLat = ti("N_LAT").asInstanceOf[NumAttr].longs
        val nLon = ti("N_LON").asInstanceOf[NumAttr].longs
        names.indices.iterator.flatMap { i =>
          val nm = names(i)
          if (!r.datasets.contains(s"/$nm")) Iterator.empty
          else {
            val v = r.readLongs(s"/$nm")
            val (ny, nx) = (nLat(i).toInt, nLon(i).toInt)
            for {
              rr <- Iterator.range(0, ny, stride)
              cc <- Iterator.range(0, nx, stride)
            } yield {
              val st = v(rr * nx + cc)
              Cell(nm, lat0(i) + rr * latS(i), lon0(i) + cc * lonS(i),
                st, (st & 1L).toInt)
            }
          }
        }
      }
      .toDF()
  }
}
