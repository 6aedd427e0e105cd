package graft

import org.apache.spark.sql.functions._

import graft.sources.{Atl06H5, Atl11H5, GranuleGroups, Hdf5, QfitH5, SourceRegistry}

/** Run-sliced and field-subset granule reads — the reference's
  * `index_range` / `field_dict` read semantics (geo_index.py:494-572,
  * ATL06_data.py:27-47, qfit_data.py:62-94) — plus the streaming
  * granule writers (one granule on the heap at a time).
  */
class H5RunSpec extends SparkSpec {
  import spark.implicits._

  // (id, lat, lon, h, dt) records spread over all six beams
  private def recs(n: Int) = (0 until n).map { i =>
    (i.toLong, -70.0 - i * 1e-4, 45.0 + i * 1e-4, 100.0 + i * 0.5, i * 0.1)
  }

  test("ATL06 run-sliced decode == whole decode filtered by position, fewer chunks") {
    val bytes = Atl06H5.granuleBytes(recs(6000), rgt = 7)
    val full = Atl06H5.decode("g.h5", bytes).toVector
    // positions within each beam: beam arrays are id-sorted, so the
    // k-th element of beam gt{p}{lr} is the k-th matching id
    val gt2l = full.filter(s => s.beam_pair == 2 && s.lr == 0)
    val runs = Seq((10L, 40L), (200L, 230L))
    val want = runs.flatMap { case (s, e) =>
      (s to e).map(i => gt2l(i.toInt))
    }.toVector
    val r = new Hdf5.Reader(bytes)
    val got = Atl06H5.decodeWith("g.h5", r,
      Some(Map("gt2l" -> runs)), None).toVector
    assert(got == want)
    // only gt2l decodes, and only its run-overlapping chunks
    val rFull = new Hdf5.Reader(bytes)
    Atl06H5.decodeWith("g.h5", rFull, None, None).length
    assert(r.chunksDecoded > 0 && r.chunksDecoded < rFull.chunksDecoded / 4,
      s"sliced=${r.chunksDecoded} full=${rFull.chunksDecoded}")
  }

  test("ATL06 field subsetting never inflates unrequested datasets") {
    val bytes = Atl06H5.granuleBytes(recs(6000), rgt = 7)
    val rAll = new Hdf5.Reader(bytes)
    val full = Atl06H5.decodeWith("g.h5", rAll, None, None).toVector
    val rSub = new Hdf5.Reader(bytes)
    val sub = Atl06H5.decodeWith("g.h5", rSub, None,
      Some(Set("latitude", "longitude"))).toVector
    assert(sub.map(s => (s.segment_id, s.latitude, s.longitude)) ==
      full.map(s => (s.segment_id, s.latitude, s.longitude)))
    // unrequested columns come back NaN, and their chunks never decode
    assert(sub.forall(s => s.h_li.isNaN && s.delta_time.isNaN))
    // per beam: segment_id + latitude + longitude are chunked,
    // delta_time is chunked, h_li contiguous → subset decodes 3 of
    // the 4 chunked datasets' chunks
    assert(rSub.chunksDecoded * 4 == rAll.chunksDecoded * 3,
      s"subset=${rSub.chunksDecoded} full=${rAll.chunksDecoded}")
  }

  test("ATL11 run-sliced decode matches, and readRuns opens only listed files") {
    val pts = recs(3000).toDF("id", "latitude", "longitude", "h_corr", "delta_time")
      .withColumn("gran", (col("id") % 3).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("atl11run").toString
    Atl11H5.writeGranules(pts, dir)
    val whole = Atl11H5.read(spark, dir)
    // slice pt2 of granule 1 by position
    val df = Atl11H5.readRuns(spark, dir,
      Map("ATL11_gran0001.h5" -> Map("pt2" -> Seq((5L, 25L)))))
    assert(df.count() == 21)
    val expect = whole
      .filter(col("file").endsWith("ATL11_gran0001.h5") && col("beam_pair") === 2)
      .orderBy("ref_pt").limit(26).orderBy(desc("ref_pt")).limit(21)
    assert(df.select("ref_pt", "latitude", "h_corr")
      .exceptAll(expect.select("ref_pt", "latitude", "h_corr")).count() == 0)
    assert(df.inputFiles.forall(_.endsWith("ATL11_gran0001.h5")))
  }

  test("QfitH5: ATM1B granule cycle, filename date → days_J2K, index_range slicing") {
    val n = 500
    val pts = (0 until n).map { i =>
      (1L, -70.0 - i * 1e-4, 45.0 + i * 1e-4, 100.0 + i * 0.5,
        i * 0.72 % 360.0, i * 0.25)
    }.toDF("gran", "latitude", "longitude", "elevation", "azimuth", "rel_time_s")
    val dir = java.nio.file.Files.createTempDirectory("qfith5").toString
    QfitH5.writeGranules(pts, dir, date = "20190315")
    val df = QfitH5.read(spark, dir).orderBy("rec_idx")
    assert(df.count() == n)
    val r0 = df.head()
    assert(r0.getAs[Long]("rec_idx") == 0L)
    assert(r0.getAs[Double]("latitude") == -70.0)
    assert(r0.getAs[Double]("elevation") == 100.0)
    // t0 from the FILENAME (qfit_data.py:65-75): gran 1 → 010000 on
    // 2019-03-15; days since 2000-01-01 plus the in-day fraction
    val t0 = java.time.Duration.between(
      java.time.LocalDateTime.of(2000, 1, 1, 0, 0, 0),
      java.time.LocalDateTime.of(2019, 3, 15, 1, 0, 0)).getSeconds / 86400.0
    assert(math.abs(r0.getAs[Double]("days_j2k") - t0) < 1e-12)
    val r100 = df.filter(col("rec_idx") === 100).head()
    assert(math.abs(r100.getAs[Double]("days_j2k") - (t0 + 25.0 / 86400.0)) < 1e-12)
    // index_range read == whole read filtered positionally
    val name = "ATM1B_20190315_010000_g1.h5"
    val sliced = QfitH5.readRuns(spark, dir, Map(name -> Seq((50L, 80L), (200L, 210L))))
    val expect = df.filter(col("rec_idx").between(50, 80) ||
      col("rec_idx").between(200, 210))
    assert(sliced.count() == 42 &&
      sliced.exceptAll(expect).count() == 0)
  }

  test("qfit_h5 joins the registry's mixed-kind merge") {
    val base = java.nio.file.Files.createTempDirectory("qh5reg").toString
    // Qfit .h5 granule in EPSG:3031's domain
    val pts = (0 until 200).map { i =>
      (3L, -70.0 - i * 1e-3, (i % 90).toDouble, 1000.0 + i, 10.0, i * 0.5)
    }.toDF("gran", "latitude", "longitude", "elevation", "azimuth", "rel_time_s")
    QfitH5.writeGranules(pts, base + "/atm", date = "20200101")
    (0 until 300).map { i =>
      (i.toLong, (i % 50) * 40.0 - 1000.0, (i / 50) * 40.0 - 1000.0, i * 0.5, i.toLong)
    }.toDF("id", "x", "y", "z", "t").write.parquet(s"$base/pts")
    val merged = SourceRegistry.indexListForFiles(spark,
      Seq("qfit_h5" -> s"$base/atm", "parquet" -> s"$base/pts"), delta = 500.0)
    val union = SourceRegistry.readAs(spark, "qfit_h5", s"$base/atm")
      .unionByName(SourceRegistry.readAs(spark, "parquet", s"$base/pts"))
    val expect = SourceRegistry.indexOf(union, 500.0)
    val got = merged.select("bin_x", "bin_y", "n_points", "id_min", "id_max")
    assert(got.exceptAll(expect).count() == 0 &&
      expect.exceptAll(got).count() == 0)
    assert(merged.agg(sum("n_points")).head().getLong(0) == 500L)
    // waveform variant reads and registers too
    val wdir = java.nio.file.Files.createTempDirectory("qh5wf").toString
    val wbytes = QfitH5.waveformGranuleBytes(
      (0 until 50).map(i => (-71.0 - i * 1e-3, 5.0, 200.0 + i, 3600.0 + i)))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$wdir/ATM1B_w_20200102_000000.h5"), wbytes)
    val wf = QfitH5.readWaveform(spark, wdir)
    assert(wf.count() == 50)
    val w0 = wf.orderBy("rec_idx").head()
    // waveform t0 is MIDNIGHT of the granule date (qfit_data.py:72,95)
    val d0 = java.time.Duration.between(
      java.time.LocalDateTime.of(2000, 1, 1, 0, 0, 0),
      java.time.LocalDateTime.of(2020, 1, 2, 0, 0, 0)).getSeconds / 86400.0
    assert(math.abs(w0.getAs[Double]("days_j2k") - (d0 + 3600.0 / 86400.0)) < 1e-12)
    assert(SourceRegistry.kinds.contains("qfit_h5") &&
      SourceRegistry.kinds.contains("qfit_waveform_h5"))
  }

  test("granule writers stream groups: many granules per partition, one at a time") {
    // 40 granules forced through 2 partitions — the sort+stream path
    // (GranuleGroups) must produce every granule byte-identically to
    // a per-granule encode; heap holds one granule's rows at a time
    val pts = (0 until 4000).map { i =>
      (i.toLong % 40, i.toLong, -70.0 - i * 1e-5, 45.0 + i * 1e-5,
        100.0 + i * 0.1, i * 0.01)
    }.toDF("gran", "id", "latitude", "longitude", "h_li", "delta_time")
      .coalesce(2)
    val dir = java.nio.file.Files.createTempDirectory("stream40").toString
    Atl06H5.writeGranules(pts, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".h5"))
    assert(files.length == 40)
    val back = Atl06H5.read(spark, dir)
    assert(back.count() == 4000)
    // spot-check one granule against a direct single-granule encode
    val g7 = (0 until 4000).filter(_ % 40 == 7).map { i =>
      (i.toLong, -70.0 - i * 1e-5, 45.0 + i * 1e-5, 100.0 + i * 0.1, i * 0.01)
    }
    val direct = Atl06H5.granuleBytes(g7, rgt = 7)
    val written = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/ATL06_gran0007.h5"))
    assert(java.util.Arrays.equals(direct, written))
  }

  test("GranuleGroups.byKey streams clustered keys single-pass") {
    val it = Iterator((1, "a"), (1, "b"), (2, "c"), (3, "d"), (3, "e"))
    val groups = GranuleGroups.byKey(it)(_._1).toVector
    assert(groups == Vector(
      (1, Seq((1, "a"), (1, "b"))), (2, Seq((2, "c"))),
      (3, Seq((3, "d"), (3, "e")))))
    assert(GranuleGroups.byKey(Iterator.empty[(Int, String)])(_._1).isEmpty)
  }
}
