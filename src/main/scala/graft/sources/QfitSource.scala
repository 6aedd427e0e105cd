package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reader for the ATM Qfit fixed-width binary point format
  * (qfit_data.py:20-80): a file is a sequence of fixed-length records
  * of 4-byte big-endian signed integers; the first word of the file
  * (i.e. of the header record) holds the record length in bytes, and
  * the 12-word variant lays out
  *
  *   w0 rel_time (ms)      w1 latitude (deg·1e6)  w2 longitude (deg·1e6,
  *   0..360)               w3 elevation (mm)      w4 start-pulse signal
  *   w5 reflected signal   w6 azimuth (deg·1e3)   w7 pitch (deg·1e3)
  *   w8 roll (deg·1e3)     w9 GPS PDOP·10         w10 pulse width
  *   w11 GPS time (packed)
  *
  * Spark-first parse: `binaryFile` scan → explode record indices →
  * per-word big-endian int32 extraction as pure codegen'd expressions
  * (substring/hex/conv on the binary column — no UDF, no
  * mapPartitions, no driver loop).  Each file parallelizes across its
  * records after the explode; a directory of flight files
  * parallelizes across files exactly like any other Spark source.
  */
object QfitSource {

  val RecordWords = 12

  /** The WAVEFORM record variant (qfit_data.py:18,25,60,95
    * `waveform_format=True`): 14 words per record — the 12-word
    * layout plus the passive channel, with the reference's waveform
    * field set (`footprint` latitude/longitude/elevation,
    * `seconds_of_day`) mapped onto
    *
    *   w0 rel_time (ms, seconds_of_day·1000)  w1..w3 footprint
    *   lat/lon/elev (as 12-word w1..w3)       w4 start-pulse signal
    *   w5 reflected signal                    w6 azimuth  w7 pitch
    *   w8 roll                                w9 passive signal
    *   w10 passive footprint lat (deg·1e6)    w11 passive lon
    *   w12 passive synthesized elev (mm)      w13 GPS time (packed)
    *
    * Time semantics differ from the 12-word read exactly as in the
    * reference: `seconds_of_day` counts from the granule day's
    * MIDNIGHT (qfit_data.py:70-71 builds t0 from the date only;
    * days_J2K = day + seconds_of_day/86400, :95), where the 12-word
    * path folds the filename's H:M:S into t0.
    */
  val WaveformRecordWords = 14

  /** Signed big-endian int32 at word `i` of the current record. */
  private def word(i: Int): Column = {
    val u = expr(
      s"cast(conv(hex(substring(content, rec_len * (rec_idx + 1) + ${4 * i} + 1, 4)), 16, 10) as bigint)")
    when(u >= 2147483648L, u - 4294967296L).otherwise(u)
  }

  /** Files of the given record length, exploded to one row per data
    * record — the shared parse chain of both variants.  A directory
    * may mix 12- and 14-word flights: each reader keeps only its own
    * format's files (the header's record-length word is the format
    * tag, as in the reference's reader dispatch).
    */
  private def records(spark: SparkSession, path: String,
                      words: Int): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .withColumn("rec_len",
        expr("cast(conv(hex(substring(content, 1, 4)), 16, 10) as int)"))
      .filter(col("rec_len") === words * 4)
      .withColumn("n_rec", expr("cast(length(content) div rec_len as int) - 1"))
      .filter(col("n_rec") > 0)
      .select(col("path"), col("content"), col("rec_len"),
        explode(expr("sequence(0, n_rec - 1)")).as("rec_idx"))

  private def signedLon(c: Column): Column =
    when(c > 180.0, c - 360.0).otherwise(c)

  /** Read a 12-word Qfit file/directory into the canonical point
    * schema.  Longitudes are normalized from 0..360 to ±180 as the
    * reference does (qfit_data.py latitude/longitude scaling).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    records(spark, path, RecordWords)
      .select(
        col("path").as("file"),
        col("rec_idx").cast("long").as("rec_idx"),
        (word(0) / 1000.0).as("rel_time_s"),
        (word(1) / 1000000.0).as("latitude"),
        signedLon(word(2) / 1000000.0).as("longitude"),
        (word(3) / 1000.0).as("elevation"),
        word(4).as("start_pulse_sig"),
        word(5).as("refl_sig"),
        (word(6) / 1000.0).as("azimuth"),
        (word(7) / 1000.0).as("pitch"),
        (word(8) / 1000.0).as("roll"),
        word(11).as("gps_time_packed"))

  /** Read a 14-word WAVEFORM-variant file/directory — the reference's
    * `waveform_format=True` field set plus the passive channel the
    * extra words carry.  `seconds_of_day` is the waveform time axis
    * (from the granule day's midnight, qfit_data.py:95).
    */
  def readWaveform(spark: SparkSession, path: String): DataFrame =
    records(spark, path, WaveformRecordWords)
      .select(
        col("path").as("file"),
        col("rec_idx").cast("long").as("rec_idx"),
        (word(0) / 1000.0).as("seconds_of_day"),
        (word(1) / 1000000.0).as("latitude"),
        signedLon(word(2) / 1000000.0).as("longitude"),
        (word(3) / 1000.0).as("elevation"),
        word(4).as("start_pulse_sig"),
        word(5).as("refl_sig"),
        (word(6) / 1000.0).as("azimuth"),
        (word(7) / 1000.0).as("pitch"),
        (word(8) / 1000.0).as("roll"),
        word(9).as("passive_sig"),
        (word(10) / 1000000.0).as("passive_lat"),
        signedLon(word(11) / 1000000.0).as("passive_lon"),
        (word(12) / 1000.0).as("passive_elev"),
        word(13).as("gps_time_packed"))

  /** Test/ingest helper: write records (12 or 14 ints each, uniform)
    * as a Qfit binary file — a header record carrying the record
    * length in word 0, then the data records, all big-endian.
    */
  def writeFile(path: java.nio.file.Path, records: Seq[Array[Int]]): Unit = {
    val words = records.headOption.map(_.length).getOrElse(RecordWords)
    require(words == RecordWords || words == WaveformRecordWords,
      s"Qfit records are 12 or 14 words, got $words")
    require(records.forall(_.length == words))
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(java.nio.file.Files.newOutputStream(path)))
    try {
      out.writeInt(words * 4)                       // header word 0: record bytes
      (1 until words).foreach(_ => out.writeInt(0))
      records.foreach(r => r.foreach(out.writeInt)) // DataOutputStream is big-endian
    } finally out.close()
  }
}

/** The ATM1B `.h5` arm of the Qfit family (qfit_data.py:62-94
  * `read_from_file`): parallel 1-D arrays — `latitude`/`longitude`/
  * `elevation` at the ROOT plus `instrument_parameters/{azimuth,
  * rel_time}` in the plain format, or `footprint/{latitude,longitude,
  * elevation}` + `time/seconds_of_day` in the waveform format — with
  * the granule date-time parsed from the FILENAME
  * (`ATM1B.*_YYYYMMDD_HHMMSS.*.h5`, qfit_data.py:65) and
  * `days_J2K = rel_time/86400 + t0` (:92-94).  `index_range` reads
  * slice the arrays positionally (qfit_data.py:84
  * `h5_f[field][i0:i1]`) — here that is a run-sliced chunk decode.
  * Same granule-per-task scale shape as [[Atl06H5]].
  */
object QfitH5 {

  final case class Rec(file: String, rec_idx: Long, latitude: Double,
                       longitude: Double, elevation: Double, azimuth: Double,
                       rel_time_s: Double, days_j2k: Double)

  final case class WRec(file: String, rec_idx: Long, latitude: Double,
                        longitude: Double, elevation: Double,
                        seconds_of_day: Double, days_j2k: Double)

  private val DateRe =
    raw"ATM1B.*_(\d\d\d\d)(\d\d)(\d\d)_(\d\d)(\d\d)(\d\d).*\.h5".r.unanchored

  /** Fractional days since 2000-01-01T00:00 from the filename
    * (qfit_data.py:65-75).  The waveform format uses the DATE only
    * (t0 at midnight, :72); the plain format folds in H:M:S (:74).
    */
  private[sources] def t0Days(name: String, dateOnly: Boolean): Double =
    name match {
      case DateRe(y, mo, d, h, mi, s) =>
        val epoch = java.time.LocalDateTime.of(2000, 1, 1, 0, 0, 0)
        val t =
          if (dateOnly) java.time.LocalDateTime.of(y.toInt, mo.toInt, d.toInt, 0, 0, 0)
          else java.time.LocalDateTime.of(y.toInt, mo.toInt, d.toInt,
            h.toInt, mi.toInt, s.toInt)
        java.time.Duration.between(epoch, t).getSeconds / 86400.0
      case _ => throw new IllegalArgumentException(
        s"no ATM1B date-time in Qfit granule name '$name'")
    }

  val AllFields: Set[String] = Set("latitude", "longitude", "elevation",
    "azimuth", "rel_time")

  /** Encode a plain-format granule: root parallel arrays + the
    * `instrument_parameters` group, chunked+deflate like real ATM1B
    * products.  recs = (latitude, longitude, elevation, azimuth,
    * rel_time_s).
    */
  def granuleBytes(recs: Seq[(Double, Double, Double, Double, Double)]): Array[Byte] = {
    val w = new Hdf5.Writer
    val rows = Hdf5.chunkRowsFor(recs.size)
    w.doubles("/latitude", recs.map(_._1).toArray, chunkRows = rows, gzip = 6)
    w.doubles("/longitude", recs.map(_._2).toArray, chunkRows = rows, gzip = 6)
    w.doubles("/elevation", recs.map(_._3).toArray, chunkRows = rows, gzip = 6,
      shuffle = true)
    w.doubles("/instrument_parameters/azimuth", recs.map(_._4).toArray,
      chunkRows = rows, gzip = 6)
    w.doubles("/instrument_parameters/rel_time", recs.map(_._5).toArray,
      chunkRows = rows, gzip = 6)
    w.toBytes
  }

  /** Encode a waveform-format granule (`footprint` + `time` groups).
    * recs = (latitude, longitude, elevation, seconds_of_day).
    */
  def waveformGranuleBytes(recs: Seq[(Double, Double, Double, Double)]): Array[Byte] = {
    val w = new Hdf5.Writer
    val rows = Hdf5.chunkRowsFor(recs.size)
    w.doubles("/footprint/latitude", recs.map(_._1).toArray, chunkRows = rows, gzip = 6)
    w.doubles("/footprint/longitude", recs.map(_._2).toArray, chunkRows = rows, gzip = 6)
    w.doubles("/footprint/elevation", recs.map(_._3).toArray, chunkRows = rows, gzip = 6)
    w.doubles("/time/seconds_of_day", recs.map(_._4).toArray, chunkRows = rows, gzip = 6)
    w.toBytes
  }

  /** Decode a plain-format granule, with the same run-slicing and
    * field subsetting contract as [[Atl06H5.decode]].  `rec_idx` is
    * the element's POSITION in the file's arrays (the reference's
    * per-file offsets, which is what its geo indexes store for
    * ATM_Qfit files).
    */
  def decode(file: String, bytes: Array[Byte],
             runs: Option[Seq[(Long, Long)]] = None,
             fields: Option[Set[String]] = None): Iterator[Rec] = {
    val r = new Hdf5.Reader(bytes)
    val want = fields.getOrElse(AllFields)
    val name = file.substring(file.lastIndexOf('/') + 1)
    val t0 = t0Days(name, dateOnly = false)
    val rs = runs.getOrElse(Seq.empty)
    val n =
      if (rs.nonEmpty) rs.map { case (s, e) => e - s + 1 }.sum.toInt
      else r.dims("/latitude")(0).toInt
    def dbls(path: String, key: String): Array[Double] =
      if (!want(key)) Array.fill(n)(Double.NaN)
      else if (rs.nonEmpty) r.readDoublesRuns(path, rs)
      else r.readDoubles(path)
    val idx: Array[Long] =
      if (rs.nonEmpty) rs.iterator.flatMap { case (s, e) => s to e }.toArray
      else Array.tabulate(n)(_.toLong)
    val lat = dbls("/latitude", "latitude")
    val lon = dbls("/longitude", "longitude")
    val elev = dbls("/elevation", "elevation")
    val az = dbls("/instrument_parameters/azimuth", "azimuth")
    val rt = dbls("/instrument_parameters/rel_time", "rel_time")
    idx.indices.iterator.map { i =>
      Rec(file, idx(i), lat(i), lon(i), elev(i), az(i), rt(i),
        rt(i) / 86400.0 + t0)
    }
  }

  /** Decode a waveform-format granule (qfit_data.py:25,95:
    * `days_J2K = t0.days + seconds_of_day/86400`, t0 at midnight).
    */
  def decodeWaveform(file: String, bytes: Array[Byte],
                     runs: Option[Seq[(Long, Long)]] = None): Iterator[WRec] = {
    val r = new Hdf5.Reader(bytes)
    val name = file.substring(file.lastIndexOf('/') + 1)
    val t0 = t0Days(name, dateOnly = true)
    val rs = runs.getOrElse(Seq.empty)
    def dbls(path: String): Array[Double] =
      if (rs.nonEmpty) r.readDoublesRuns(path, rs) else r.readDoubles(path)
    val idx: Array[Long] =
      if (rs.nonEmpty) rs.iterator.flatMap { case (s, e) => s to e }.toArray
      else Array.tabulate(r.dims("/footprint/latitude")(0).toInt)(_.toLong)
    val lat = dbls("/footprint/latitude")
    val lon = dbls("/footprint/longitude")
    val elev = dbls("/footprint/elevation")
    val sod = dbls("/time/seconds_of_day")
    idx.indices.iterator.map { i =>
      WRec(file, idx(i), lat(i), lon(i), elev(i), sod(i), t0 + sod(i) / 86400.0)
    }
  }

  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", "*.h5").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, c) => decode(p, c) }
      .toDF()
  }

  def readWaveform(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", "*.h5").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, c) => decodeWaveform(p, c) }
      .toDF()
  }

  /** Run-sliced read — `runsByFile` maps granule file NAME to its
    * inclusive element runs, the ATM_Qfit arm of
    * get_data_for_geo_index (geo_index.py:549-552).
    */
  def readRuns(spark: SparkSession, dir: String,
               runsByFile: Map[String, Seq[(Long, Long)]],
               fields: Option[Set[String]] = None): DataFrame = {
    import spark.implicits._
    if (runsByFile.isEmpty) return spark.emptyDataset[Rec].toDF()
    val bc = spark.sparkContext.broadcast(runsByFile)
    val paths = runsByFile.keys.map(f => s"$dir/$f").toSeq
    spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, c) =>
        val name = p.substring(p.lastIndexOf('/') + 1)
        bc.value.get(name) match {
          case Some(rs) => decode(p, c, Some(rs), fields)
          case None => Iterator.empty
        }
      }
      .toDF()
  }

  /** Write points as plain-format ATM1B granules, one file per `gran`
    * key; the filename carries the reference's regex-dated pattern
    * with the granule hour.  Input columns: gran, latitude,
    * longitude, elevation, azimuth, rel_time_s.
    */
  def writeGranules(points: DataFrame, dir: String,
                    date: String = "20190315"): Unit = {
    val spark = points.sparkSession
    import spark.implicits._
    val hconf = spark.sparkContext.broadcast(
      new SerHadoopConf(spark.sparkContext.hadoopConfiguration))
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(dirPath)
    points
      .select(col("gran").cast("long"), col("latitude").cast("double"),
        col("longitude").cast("double"), col("elevation").cast("double"),
        col("azimuth").cast("double"), col("rel_time_s").cast("double"))
      .repartition(col("gran"))
      .sortWithinPartitions("gran", "rel_time_s")
      .as[(Long, Double, Double, Double, Double, Double)]
      .mapPartitions { it =>
        GranuleGroups.byKey(it)(_._1).map { case (gran, rows) =>
          val bytes = granuleBytes(rows.map(r => (r._2, r._3, r._4, r._5, r._6)))
          val p = new org.apache.hadoop.fs.Path(
            f"$dir/ATM1B_${date}_${gran % 24}%02d0000_g$gran.h5")
          val fs = p.getFileSystem(hconf.value.conf)
          val os = fs.create(p, true)
          try os.write(bytes) finally os.close()
          gran
        }
      }
      .write.format("noop").mode("overwrite").save()
  }

  /** Registry adapter (lat/lon reader contract). */
  def readForRegistry(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir).select(
      col("rec_idx"), col("latitude"), col("longitude"),
      col("elevation"), col("rel_time_s"))

  def readWaveformForRegistry(spark: SparkSession, dir: String): DataFrame =
    readWaveform(spark, dir).select(
      col("rec_idx"), col("latitude"), col("longitude"),
      col("elevation"), col("seconds_of_day"))
}
