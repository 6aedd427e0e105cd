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
