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

  /** Signed big-endian int32 at word `i` of the current record. */
  private def word(i: Int): Column = {
    val u = expr(
      s"cast(conv(hex(substring(content, rec_len * (rec_idx + 1) + ${4 * i} + 1, 4)), 16, 10) as bigint)")
    when(u >= 2147483648L, u - 4294967296L).otherwise(u)
  }

  /** Read a Qfit file/directory into the canonical point schema.
    * Longitudes are normalized from 0..360 to ±180 as the reference
    * does (qfit_data.py latitude/longitude scaling).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val lon0 = word(2) / 1000000.0
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .withColumn("rec_len",
        expr("cast(conv(hex(substring(content, 1, 4)), 16, 10) as int)"))
      .filter(col("rec_len") === RecordWords * 4)
      .withColumn("n_rec", expr("cast(length(content) div rec_len as int) - 1"))
      .filter(col("n_rec") > 0)
      .select(col("path"), col("content"), col("rec_len"),
        explode(expr("sequence(0, n_rec - 1)")).as("rec_idx"))
      .select(
        col("path").as("file"),
        col("rec_idx").cast("long").as("rec_idx"),
        (word(0) / 1000.0).as("rel_time_s"),
        (word(1) / 1000000.0).as("latitude"),
        when(lon0 > 180.0, lon0 - 360.0).otherwise(lon0).as("longitude"),
        (word(3) / 1000.0).as("elevation"),
        word(4).as("start_pulse_sig"),
        word(5).as("refl_sig"),
        (word(6) / 1000.0).as("azimuth"),
        (word(7) / 1000.0).as("pitch"),
        (word(8) / 1000.0).as("roll"),
        word(11).as("gps_time_packed"))
  }

  /** Test/ingest helper: write records (12 ints each) as a Qfit binary
    * file — a header record carrying the record length in word 0, then
    * the data records, all big-endian.
    */
  def writeFile(path: java.nio.file.Path, records: Seq[Array[Int]]): Unit = {
    require(records.forall(_.length == RecordWords))
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(java.nio.file.Files.newOutputStream(path)))
    try {
      out.writeInt(RecordWords * 4)                 // header word 0: record bytes
      (1 until RecordWords).foreach(_ => out.writeInt(0))
      records.foreach(r => r.foreach(out.writeInt)) // DataOutputStream is big-endian
    } finally out.close()
  }
}
