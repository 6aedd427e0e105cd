package graft

import org.apache.spark.sql.functions._
import graft.operators.GeoOps
import graft.sources.{QfitSource, SourceRegistry}

/** File-type dispatch registry ([[SourceRegistry]]): one call builds
  * a merged geo-index from MIXED source kinds (csv + parquet + Qfit
  * binary), obeying the `from_list` merge law; saved indexes are
  * adopted without a point scan; unknown kinds refuse loudly.
  */
class SourceRegistrySpec extends SparkSpec {
  import spark.implicits._

  private def mk(lo: Int, hi: Int) = (lo until hi).map { i =>
    (i.toLong, (i % 50) * 40.0 - 1000.0, (i / 50) * 40.0 - 1000.0,
      i * 0.5, i.toLong * 1000)
  }.toDF("id", "x", "y", "z", "t")

  test("one merged index from mixed csv/parquet/qfit inputs obeys the from_list law") {
    val base = java.nio.file.Files.createTempDirectory("sreg").toString
    mk(0, 300).write.option("header", "true").csv(s"$base/pts_csv")
    mk(300, 600).write.parquet(s"$base/pts_parquet")
    // southern-hemisphere Qfit records (EPSG:3031's domain)
    QfitSource.writeFile(
      java.nio.file.Paths.get(s"$base/flight.qi"),
      (0 until 100).map { i =>
        Array(i * 1000, -70000000 - i * 1000, (i % 90) * 100000,
          1000000 + i * 500, 1, 2, 3, 4, 5, 6, 7, 8)
      })
    val files = Seq(
      "csv" -> s"$base/pts_csv",
      "parquet" -> s"$base/pts_parquet",
      "qfit" -> s"$base/flight.qi")
    val merged = SourceRegistry.indexListForFiles(spark, files, delta = 500.0)
    // from_list law: merge(index(read(f_i))) == index(∪ read(f_i))
    val union = files.zipWithIndex.map { case ((k, p), i) =>
      SourceRegistry.readAs(spark, k, p).withColumn("src", lit(i))
    }.reduce(_ unionByName _)
    val expect = union
      .select(GeoOps.binOf(col("x"), 500.0).as("bin_x"),
        GeoOps.binOf(col("y"), 500.0).as("bin_y"), col("id"), col("src"))
      .groupBy("bin_x", "bin_y")
      .agg(count("*").as("n_points"),
        min("id").as("id_min"), max("id").as("id_max"),
        countDistinct("src").as("n_sources"))
    assert(merged.exceptAll(expect).count() == 0 &&
      expect.exceptAll(merged).count() == 0)
    // all three kinds actually contributed
    assert(union.select("src").distinct().count() == 3)
    assert(merged.agg(sum("n_points")).head().getLong(0) == 700L)
  }

  test("a saved geoindex is adopted bin-for-bin, no point scan") {
    val base = java.nio.file.Files.createTempDirectory("sreg2").toString
    mk(0, 200).write.parquet(s"$base/a")
    mk(200, 500).write.parquet(s"$base/b")
    // pre-build source b's partial index and SAVE it
    SourceRegistry.forFile(spark, "parquet", s"$base/b", 500.0)
      .write.parquet(s"$base/b_index")
    val viaIndex = SourceRegistry.indexListForFiles(spark, Seq(
      "parquet" -> s"$base/a",
      SourceRegistry.IndexKind -> s"$base/b_index"), 500.0)
    val direct = SourceRegistry.indexListForFiles(spark, Seq(
      "parquet" -> s"$base/a", "parquet" -> s"$base/b"), 500.0)
    assert(viaIndex.exceptAll(direct).count() == 0 &&
      direct.exceptAll(viaIndex).count() == 0)
    // the adoption read touches only the saved index's files
    val opened = SourceRegistry.forFile(
      spark, SourceRegistry.IndexKind, s"$base/b_index", 500.0).inputFiles
    assert(opened.nonEmpty && opened.forall(_.contains("b_index")))
  }

  test("the DEM arm indexes real GeoTIFF granules, merged with point kinds") {
    val base = java.nio.file.Files.createTempDirectory("sreg3").toString
    // a DEM: 20x20 cells at δ=100 written as REAL .tif granules
    val grid = (0 until 400).map { i =>
      ((i % 20) * 100L - 1000L, (i / 20) * 100L - 1000L, i * 0.25)
    }.toDF("gx", "gy", "gz")
    graft.sources.GeoTiff.writeTiles(grid, s"$base/dem", epsg = 3031,
      delta = 100.0, tileSize = 1000.0)
    mk(0, 100).write.parquet(s"$base/pts")
    val merged = SourceRegistry.indexListForFiles(spark, Seq(
      SourceRegistry.DemKind -> s"$base/dem",
      "parquet" -> s"$base/pts"), delta = 500.0)
    // DEM cells land as points at their cell centers
    val demPts = SourceRegistry.readAs(spark, SourceRegistry.DemKind, s"$base/dem")
    assert(demPts.count() == 400L)
    assert(demPts.select("id").distinct().count() == 400L) // packed id unique
    assert(merged.agg(sum("n_points")).head().getLong(0) == 500L)
    // z survives the granule round-trip
    val z = demPts.filter(col("x") === -1000.0 && col("y") === -1000.0)
      .select("z").head().getDouble(0)
    assert(z == 0.0)
  }

  test("real ATL06 .h5 granules index like any point kind (codec-backed)") {
    val base = java.nio.file.Files.createTempDirectory("sreg4").toString
    // southern-hemisphere granule content (EPSG:3031's domain)
    val gran = (600 until 1000).map { i =>
      (i % 3, i.toLong, -70.0 - (i % 50) * 0.01, (i % 100) * 0.5,
        i * 0.5, i * 1.0)
    }.toDF("gran", "id", "latitude", "longitude", "h_li", "delta_time")
    graft.sources.Atl06H5.writeGranules(gran, s"$base/granules")
    val pts = SourceRegistry.readAs(spark, "atl06_h5", s"$base/granules")
    assert(pts.count() == 400L)
    assert(pts.select("id").distinct().count() == 400L) // segment ids carry through
    // z survives the .h5 cycle exactly
    assert(pts.filter(col("id") === 700L).select("z").head().getDouble(0) == 350.0)
    // and the kind participates in a mixed merge with every other arm
    mk(0, 300).write.option("header", "true").csv(s"$base/pts_csv")
    val grid = (0 until 100).map { i =>
      ((i % 10) * 100L - 500L, (i / 10) * 100L - 500L, i * 1.0)
    }.toDF("gx", "gy", "gz")
    graft.sources.GeoTiff.writeTiles(grid, s"$base/dem", epsg = 3031,
      delta = 100.0, tileSize = 1000.0)
    val files = Seq(
      "csv" -> s"$base/pts_csv",
      "atl06_h5" -> s"$base/granules",
      SourceRegistry.DemKind -> s"$base/dem")
    val merged = SourceRegistry.indexListForFiles(spark, files, delta = 500.0)
    val union = files.zipWithIndex.map { case ((k, p), i) =>
      SourceRegistry.readAs(spark, k, p).withColumn("src", lit(i))
    }.reduce(_ unionByName _)
    val expect = union
      .select(GeoOps.binOf(col("x"), 500.0).as("bin_x"),
        GeoOps.binOf(col("y"), 500.0).as("bin_y"), col("id"), col("src"))
      .groupBy("bin_x", "bin_y")
      .agg(count("*").as("n_points"),
        min("id").as("id_min"), max("id").as("id_max"),
        countDistinct("src").as("n_sources"))
    // the from_list law holds across heterogeneous id spaces (packed
    // DEM cell ids, ATL06 segment ids, csv row ids)
    assert(merged.exceptAll(expect).count() == 0 &&
      expect.exceptAll(merged).count() == 0)
    assert(merged.agg(sum("n_points")).head().getLong(0) == 800L)
  }

  test("a reference-shaped .h5 geoindex is adopted bin-for-bin, no point scan") {
    val base = java.nio.file.Files.createTempDirectory("sreg5").toString
    val pts = mk(0, 500)
    // exact per-bin runs (gaps-and-islands over consecutive ids) in
    // the reference's to_file layout (geo_index.py:205-229)
    val binned = pts.select(GeoOps.binOf(col("x"), 500.0).as("bin_x"),
      GeoOps.binOf(col("y"), 500.0).as("bin_y"), col("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bin_x", "bin_y").orderBy("id")
    val runs = binned
      .withColumn("island", col("id") - row_number().over(w))
      .groupBy("bin_x", "bin_y", "island")
      .agg(min("id").as("run_start"), max("id").as("run_end"))
      .drop("island").withColumn("file_num", lit(0L))
    graft.sources.GeoIndexH5.write(runs, 500.0, "+proj=stere +lat_0=-90",
      "/data", Seq(("pts.parquet", "ATL06")), s"$base/index.h5")
    // registry adoption == the direct point-scan index, bin for bin
    val adopted = SourceRegistry.forFile(
      spark, SourceRegistry.IndexKind, s"$base/index.h5", 500.0)
    val direct = SourceRegistry.indexOf(pts, 500.0)
    assert(adopted.exceptAll(direct).count() == 0 &&
      direct.exceptAll(adopted).count() == 0)
    // and only the .h5 is opened — no point files
    val opened = adopted.inputFiles
    assert(opened.nonEmpty && opened.forall(_.endsWith("index.h5")))
    // an index with ZERO runs (nothing matched the binned domain)
    // still writes, adopts empty, and keeps its attrs readable —
    // the caller shape of the writer's childless-group regression
    val emptyPath = s"$base/empty.h5"
    graft.sources.GeoIndexH5.write(runs.limit(0), 500.0,
      "+proj=stere +lat_0=-90", "/data", Seq(("pts.parquet", "ATL06")),
      emptyPath)
    assert(SourceRegistry.forFile(
      spark, SourceRegistry.IndexKind, emptyPath, 500.0).count() == 0)
    assert(graft.sources.GeoIndexH5.attrs(spark, emptyPath)("delta") == "500.0")
    // index attrs carry the reference's metadata surface
    val at = graft.sources.GeoIndexH5.attrs(spark, s"$base/index.h5")
    assert(at("SRS_proj4") == "+proj=stere +lat_0=-90" &&
      at("file_0") == "pts.parquet" && at("type_0") == "ATL06")
  }

  test("change_root re-bases file_N attrs like geo_index.py:193-204, bins intact") {
    val base = java.nio.file.Files.createTempDirectory("sreg7").toString
    val pts = mk(0, 200)
    val binned = pts.select(GeoOps.binOf(col("x"), 500.0).as("bin_x"),
      GeoOps.binOf(col("y"), 500.0).as("bin_y"), col("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bin_x", "bin_y").orderBy("id")
    val runs = binned.withColumn("island", col("id") - row_number().over(w))
      .groupBy("bin_x", "bin_y", "island")
      .agg(min("id").as("run_start"), max("id").as("run_end"))
      .drop("island").withColumn("file_num", lit(0L))
    val files = Seq(("/glas/f1.h5", "ATL06"), ("/glas/sub/f2.h5", "ATL06"))
    graft.sources.GeoIndexH5.write(runs, 500.0, "+proj=stere", "/Data",
      files, s"$base/a.h5")
    graft.sources.GeoIndexH5.write(runs, 500.0, "+proj=stere", "/Data",
      files, s"$base/b.h5")
    val before = graft.sources.GeoIndexH5.adopt(spark, s"$base/a.h5")
      .orderBy("bin_x", "bin_y").collect().toSeq
    // case 1 — new root NOT contained in the absolutized paths:
    // files become absolute (old_root + file), dir_root flips
    graft.sources.GeoIndexH5.changeRoot(spark, s"$base/a.h5", "/mnt")
    val a1 = graft.sources.GeoIndexH5.attrs(spark, s"$base/a.h5")
    assert(a1("dir_root") == "/mnt" && a1("file_0") == "/Data/glas/f1.h5" &&
      a1("type_0") == "ATL06")
    // case 2 — new root contained: the prefix strips, paths become
    // relative to the new root (geo_index.py:199-201 replace)
    graft.sources.GeoIndexH5.changeRoot(spark, s"$base/b.h5", "/Data/glas")
    val a2 = graft.sources.GeoIndexH5.attrs(spark, s"$base/b.h5")
    assert(a2("dir_root") == "/Data/glas" && a2("file_0") == "/f1.h5" &&
      a2("file_1") == "/sub/f2.h5" && a2("type_1") == "ATL06")
    // the bins and run statistics are untouched by the rewrite
    val after = graft.sources.GeoIndexH5.adopt(spark, s"$base/a.h5")
      .orderBy("bin_x", "bin_y").collect().toSeq
    assert(after == before)
    // case 3 — the root string RECURS inside a path segment: only
    // the leading prefix strips (the reference's str.replace would
    // delete the inner occurrence and corrupt the filename)
    graft.sources.GeoIndexH5.write(runs, 500.0, "+proj=stere", "/Data",
      Seq(("/glas/backup/Data/f3.h5", "ATL06")), s"$base/c.h5")
    graft.sources.GeoIndexH5.changeRoot(spark, s"$base/c.h5", "/Data")
    val a3 = graft.sources.GeoIndexH5.attrs(spark, s"$base/c.h5")
    assert(a3("dir_root") == "/Data" && a3("file_0") == "/glas/backup/Data/f3.h5")
  }

  test("indexed_h5 adopts all three reference sub-shapes without a point scan") {
    import graft.sources.Hdf5
    val base = java.nio.file.Files.createTempDirectory("sreg6").toString
    // shape 1: INDEX with bin_index (first/last row offsets, 2xN)
    val w1 = new Hdf5.Writer
    w1.doubles("/INDEX/bin_x", Array(0.0, 500.0, 1000.0))
    w1.doubles("/INDEX/bin_y", Array(-500.0, 0.0, 500.0))
    w1.longs("/INDEX/bin_index",
      Array(0L, 40L, 100L, 39L, 99L, 179L), dims = Seq(2, 3))
    w1.doubles("/h", Array.tabulate(180)(_.toDouble))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$base/full.h5"), w1.toBytes)
    val a1 = SourceRegistry.forFile(spark, "indexed_h5", s"$base/full.h5", 500.0)
    val rows1 = a1.orderBy("bin_x").collect()
    assert(rows1.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq == Seq(
      (0L, -500L, 40L, 0L, 39L), (500L, 0L, 60L, 40L, 99L),
      (1000L, 500L, 80L, 100L, 179L)))
    // shape 2: INDEX with centers only → fake offsets (null n_points)
    val w2 = new Hdf5.Writer
    w2.doubles("/INDEX/bin_x", Array(0.0, 500.0))
    w2.doubles("/INDEX/bin_y", Array(0.0, 500.0))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$base/bare.h5"), w2.toBytes)
    val a2 = SourceRegistry.forFile(spark, "indexed_h5", s"$base/bare.h5", 500.0)
    assert(a2.count() == 2 && a2.filter(col("n_points").isNull).count() == 2)
    // shape 3: no INDEX, just {x}E_{y}N bin groups
    val w3 = new Hdf5.Writer
    w3.doubles("/1000E_-500N/h", Array(1.0))
    w3.doubles("/-500E_0N/h", Array(2.0))
    w3.doubles("/not_a_bin/h", Array(3.0))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$base/groups.h5"), w3.toBytes)
    val a3 = SourceRegistry.forFile(spark, "indexed_h5", s"$base/groups.h5", 500.0)
    assert(a3.select("bin_x", "bin_y").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet == Set((1000L, -500L), (-500L, 0L)))
    // and a shape-1 file participates in a mixed merge (null-free)
    val merged = SourceRegistry.indexListForFiles(spark, Seq(
      "indexed_h5" -> s"$base/full.h5",
      "parquet" -> { mk(0, 100).write.parquet(s"$base/pts"); s"$base/pts" }),
      500.0)
    assert(merged.agg(sum("n_points")).head().getLong(0) == 280L)
  }

  test("an unregistered kind refuses with the known-kind list") {
    val e = intercept[IllegalArgumentException] {
      SourceRegistry.readAs(spark, "hdf5", "/nowhere")
    }
    assert(e.getMessage.contains("unregistered") &&
      e.getMessage.contains("qfit"))
  }
}
