package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.QfitSource

/** Qfit binary point source: synthetic records round-trip through the
  * big-endian fixed-width parse and feed the geo pipeline.
  */
class QfitSpec extends SparkSpec {
  import spark.implicits._

  private def rec(t: Int, latE6: Int, lonE6: Int, elevMm: Int): Array[Int] =
    Array(t, latE6, lonE6, elevMm, 100, 200, 45000, -1500, 2500, 13, 7, 120155000)

  test("reads synthetic Qfit records back bit-exactly") {
    val dir = Files.createTempDirectory("qfit")
    QfitSource.writeFile(dir.resolve("flight1.qi"), Seq(
      rec(1000, -70123456, 245000000, 1234567),
      rec(2000, -70123460, 244999000, 1234000)))
    QfitSource.writeFile(dir.resolve("flight2.qi"), Seq(
      rec(3000, -71000000, 10000000, -500)))
    val df = QfitSource.read(spark, dir.toString + "/*.qi")
    assert(df.count() == 3)
    val r0 = df.filter($"rel_time_s" === 1.0).head()
    assert(r0.getAs[Double]("latitude") == -70.123456)
    // 245° normalizes to −115°
    assert(r0.getAs[Double]("longitude") == 245.0 - 360.0)
    assert(r0.getAs[Double]("elevation") == 1234.567)
    assert(r0.getAs[Long]("start_pulse_sig") == 100L)
    assert(r0.getAs[Double]("pitch") == -1.5)
    // negative elevations survive the signed big-endian parse
    val r2 = df.filter($"rel_time_s" === 3.0).head()
    assert(r2.getAs[Double]("elevation") == -0.5)
    assert(r2.getAs[Double]("longitude") == 10.0)
  }

  test("a truncated trailing record is ignored, not mis-parsed") {
    val dir = Files.createTempDirectory("qfit3")
    val f = dir.resolve("trunc.qi")
    QfitSource.writeFile(f, Seq(rec(1000, -70000000, 10000000, 500)))
    // simulate a cut-off transfer: 5 stray bytes after the last record
    Files.write(f, Array[Byte](1, 2, 3, 4, 5),
      java.nio.file.StandardOpenOption.APPEND)
    val df = QfitSource.read(spark, dir.toString)
    assert(df.count() == 1)
    assert(df.head().getAs[Double]("elevation") == 0.5)
  }

  test("property: arbitrary int records round-trip bit-exactly (incl. extremes)") {
    val rnd = new scala.util.Random(42)
    val extremes = Seq(Int.MinValue, Int.MaxValue, -1, 0, 1)
    val recs = (0 until 40).map { i =>
      Array.tabulate(12)(w =>
        if (i < 5) extremes(i) else rnd.nextInt())
    }
    val dir = Files.createTempDirectory("qfit_prop")
    QfitSource.writeFile(dir.resolve("p.qi"), recs)
    // raw signed words, undoing the reader's unit scaling
    val back = QfitSource.read(spark, dir.toString)
      .orderBy("rec_idx")
      .select(
        (col("rel_time_s") * 1000.0).cast("long"),
        (col("latitude") * 1000000.0),
        col("start_pulse_sig"), col("refl_sig"), col("gps_time_packed"))
      .collect()
    assert(back.length == recs.length)
    recs.zip(back).foreach { case (r, row) =>
      assert(row.getLong(0) == r(0).toLong, s"w0: ${row.getLong(0)} vs ${r(0)}")
      // v/1e6*1e6 re-rounds; the error is far below half a raw unit
      assert(math.abs(row.getDouble(1) - r(1).toDouble) < 1e-3)
      assert(row.getLong(2) == r(4).toLong)
      assert(row.getLong(3) == r(5).toLong)
      assert(row.getLong(4) == r(11).toLong)
    }
  }

  private def wrec(sodMs: Int, latE6: Int, lonE6: Int, elevMm: Int,
                   passiveSig: Int): Array[Int] =
    Array(sodMs, latE6, lonE6, elevMm, 100, 200, 45000, -1500, 2500,
      passiveSig, latE6 + 500, lonE6 + 700, elevMm - 3000, 120155000)

  test("waveform variant: 14-word records decode the passive channel") {
    val dir = Files.createTempDirectory("qfitw")
    QfitSource.writeFile(dir.resolve("wf.qi"), Seq(
      wrec(43200500, -70123456, 245000000, 1234567, 87),
      wrec(43201000, -70123460, 244999000, -500, -3)))
    val df = QfitSource.readWaveform(spark, dir.toString)
    assert(df.count() == 2)
    val r0 = df.filter($"rec_idx" === 0).head()
    // the waveform time axis: seconds from the granule day's midnight
    assert(r0.getAs[Double]("seconds_of_day") == 43200.5)
    assert(r0.getAs[Double]("latitude") == -70.123456)
    assert(r0.getAs[Double]("longitude") == 245.0 - 360.0)
    assert(r0.getAs[Double]("elevation") == 1234.567)
    assert(r0.getAs[Long]("passive_sig") == 87L)
    assert(r0.getAs[Double]("passive_lat") == -70.122956)
    assert(r0.getAs[Double]("passive_lon") == 245.0007 - 360.0)
    assert(r0.getAs[Double]("passive_elev") == 1231.567)
    // signed parse holds in the passive words too
    val r1 = df.filter($"rec_idx" === 1).head()
    assert(r1.getAs[Long]("passive_sig") == -3L)
    assert(r1.getAs[Double]("elevation") == -0.5)
  }

  test("mixed directory: each reader keeps only its own record format") {
    val dir = Files.createTempDirectory("qfitmix")
    QfitSource.writeFile(dir.resolve("a12.qi"),
      Seq(rec(1000, -70000000, 10000000, 500)))
    QfitSource.writeFile(dir.resolve("b14.qi"),
      Seq(wrec(2000, -71000000, 20000000, 600, 5),
        wrec(3000, -71000100, 20000100, 700, 6)))
    assert(QfitSource.read(spark, dir.toString).count() == 1)
    assert(QfitSource.readWaveform(spark, dir.toString).count() == 2)
    // the 12-word reader never mis-parses 14-word bytes as records
    assert(QfitSource.read(spark, dir.toString)
      .select("file").distinct().as[String].head().endsWith("a12.qi"))
  }

  test("Qfit points project and geo-index like any point frame") {
    val dir = Files.createTempDirectory("qfit2")
    QfitSource.writeFile(dir.resolve("f.qi"),
      (0 until 50).map(i => rec(i * 100, -70000000 - i * 1000, i * 100000, 900000 + i)))
    val pts = QfitSource.read(spark, dir.toString)
      .withColumn("z", $"elevation")
    val pf = PointFrame(pts).withXY(3031)
    val idx = pf.geoIndex(100000.0).df
    assert(idx.agg(sum("n_points")).as[Long].head() == 50L)
    assert(idx.count() >= 1)
  }
}
