package graft

import org.apache.spark.sql.functions._

import graft.sources.{Hdf5, IndexedH5, SourceRegistry}

/** Point-data reads out of self-indexed `.h5` files — the reference's
  * `read_indexed_h5_file` (geo_index.py:605-665), both arms, plus the
  * matlab adoption variant (geo_index.py:318-326) and its km bin
  * naming (geo_index.py:570).
  */
class IndexedH5ReadSpec extends SparkSpec {
  import spark.implicits._

  // deterministic point cloud over a few delta=400 bins
  private def pts(n: Int) = (0 until n).map { i =>
    (0L, i.toLong, (i * 7919 % 2000) - 1000.0, (i * 104729 % 2000) - 1000.0,
      100.0 + i * 0.25, i * 0.5)
  }.toDF("gran", "ord", "x", "y", "z", "time")

  test("bin_index arm: adopted runs slice the contiguous datasets exactly") {
    val dir = java.nio.file.Files.createTempDirectory("ixread").toString
    IndexedH5.writeIndexed(pts(5000), dir, delta = 400.0)
    val path = s"$dir/indexed_0000.h5"
    val idx = IndexedH5.adopt(spark, path)
    // every bin carries offsets, and they tile [0, n) without overlap
    val rows = idx.orderBy("id_min").collect()
    assert(rows.forall(!_.isNullAt(2)))
    assert(rows.head.getLong(3) == 0L)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(3) == a.getLong(4) + 1)
    case _ => }
    // a two-bin query through the adopted index == direct filter
    val picked = rows.take(2).map(r => (r.getLong(3), r.getLong(4))).toSeq
    val got = IndexedH5.readData(spark, path, Seq("x", "y", "z", "time"),
      runs = picked)
      .select("x", "y", "z", "time").as[(Double, Double, Double, Double)]
      .collect().toSet
    val pickedBins = rows.take(2).map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = pts(5000)
      .select(col("x"), col("y"), col("z"), col("time"),
        graft.operators.GeoOps.binOf(col("x"), 400.0).as("bx"),
        graft.operators.GeoOps.binOf(col("y"), 400.0).as("by"))
      .as[(Double, Double, Double, Double, Long, Long)]
      .collect()
      .filter(t => pickedBins((t._5, t._6)))
      .map(t => (t._1, t._2, t._3, t._4)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("bin_index arm: sliced read inflates only run-overlapping chunks") {
    val dir = java.nio.file.Files.createTempDirectory("ixchunk").toString
    IndexedH5.writeIndexed(pts(20000), dir, delta = 400.0)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/indexed_0000.h5"))
    val rFull = new Hdf5.Reader(bytes)
    rFull.readDoubles("/x"); rFull.readDoubles("/y")
    val rSliced = new Hdf5.Reader(bytes)
    rSliced.readDoublesRuns("/x", Seq((100L, 300L)))
    rSliced.readDoublesRuns("/y", Seq((100L, 300L)))
    assert(rSliced.chunksDecoded > 0 &&
      rSliced.chunksDecoded < rFull.chunksDecoded / 4,
      s"sliced=${rSliced.chunksDecoded} full=${rFull.chunksDecoded}")
  }

  test("distinct-bin arm: field-major and bin-major lookups both resolve; absent field is null") {
    val dir = java.nio.file.Files.createTempDirectory("bingrp").toString
    IndexedH5.writeBinGroups(pts(800), dir, delta = 400.0)
    val path = s"$dir/bins_0000.h5"
    // writeBinGroups puts x,y field-major and z,time bin-major
    val r = new Hdf5.Reader(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)))
    val ds = r.datasets.toSet
    assert(ds.exists(p => p.startsWith("/x/") && p.endsWith("N")))
    assert(ds.exists(p => p.matches("/-?\\d+E_-?\\d+N/z")))
    val bins = IndexedH5.adopt(spark, path)
      .select("bin_x", "bin_y").as[(Long, Long)].collect().toSeq.sorted.take(3)
    val got = IndexedH5.readData(spark, path,
      Seq("x", "y", "z", "time", "nope"), bins = bins)
    assert(got.filter(col("nope").isNotNull).count() == 0)
    val gotSet = got.select("x", "y", "z", "time")
      .as[(Double, Double, Double, Double)].collect().toSet
    val binSet = bins.toSet
    val want = pts(800)
      .select(col("x"), col("y"), col("z"), col("time"),
        graft.operators.GeoOps.binOf(col("x"), 400.0).as("bx"),
        graft.operators.GeoOps.binOf(col("y"), 400.0).as("by"))
      .as[(Double, Double, Double, Double, Long, Long)]
      .collect().filter(t => binSet((t._5, t._6)))
      .map(t => (t._1, t._2, t._3, t._4)).toSet
    assert(gotSet == want && gotSet.nonEmpty)
  }

  test("matlab arm: km bin names resolve through /1000, adoption ignores offsets") {
    val dir = java.nio.file.Files.createTempDirectory("mlgrp").toString
    IndexedH5.writeBinGroups(pts(800), dir, delta = 1000.0, kmNames = true)
    val path = s"$dir/bins_0000.h5"
    val r = new Hdf5.Reader(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)))
    // group names are km (|coord| <= 1), not meters
    val binGroups = r.datasets.filter(_.matches("/x/-?\\d+E_-?\\d+N"))
    assert(binGroups.nonEmpty && binGroups.forall { p =>
      val m = "/x/(-?\\d+)E_(-?\\d+)N".r.findFirstMatchIn(p).get
      math.abs(m.group(1).toLong) <= 1 && math.abs(m.group(2).toLong) <= 1
    })
    val adopted = SourceRegistry.forFile(
      spark, "indexed_h5_from_matlab", path, delta = 1000.0)
    assert(adopted.filter(col("n_points").isNotNull).count() == 0)
    val bins = adopted.select("bin_x", "bin_y").as[(Long, Long)]
      .collect().toSeq
    val got = IndexedH5.readData(spark, path, Seq("x", "y", "z"),
      bins = bins, fromMatlab = true)
      .select("x", "y", "z").as[(Double, Double, Double)].collect().toSet
    val want = pts(800).select("x", "y", "z")
      .as[(Double, Double, Double)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("field present for only SOME bins stays per-bin aligned (nulls, no shift)") {
    // /x has both bins but /z exists only for the second — the first
    // bin's rows must carry null z, never the second bin's values
    val w = new Hdf5.Writer
    w.doubles("/x/0E_0N", Array(1.0, 2.0))
    w.doubles("/x/400E_0N", Array(10.0, 20.0))
    w.doubles("/400E_0N/z", Array(7.0, 8.0))
    val p = java.nio.file.Files.createTempDirectory("ragged").toString + "/r.h5"
    java.nio.file.Files.write(java.nio.file.Paths.get(p), w.toBytes)
    val got = IndexedH5.readData(spark, p, Seq("x", "z"),
      bins = Seq((0L, 0L), (400L, 0L)))
      .select("x", "z").collect()
      .map(r => (r.getDouble(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toSet
    assert(got == Set((1.0, None), (2.0, None),
      (10.0, Some(7.0)), (20.0, Some(8.0))))
  }

  test("adoptMatlab never trusts bin_index even when present") {
    val w = new Hdf5.Writer
    w.doubles("/INDEX/bin_x", Array(0.0, 1000.0))
    w.doubles("/INDEX/bin_y", Array(0.0, -1000.0))
    w.longs("/INDEX/bin_index", Array(0L, 10L, 9L, 19L), dims = Seq(2L, 2L))
    val p = java.nio.file.Files.createTempDirectory("mladopt").toString + "/m.h5"
    java.nio.file.Files.write(java.nio.file.Paths.get(p), w.toBytes)
    val a = IndexedH5.adoptMatlab(spark, p).orderBy("bin_x").collect()
    assert(a.length == 2 && a.forall(_.isNullAt(2)) &&
      a.forall(r => r.getLong(3) == -1L && r.getLong(4) == -1L))
    // while plain indexed_h5 adoption DOES read the offsets
    val b = IndexedH5.adopt(spark, p).orderBy("bin_x").collect()
    assert(b.forall(!_.isNullAt(2)) && b.map(_.getLong(3)).toSet == Set(0L, 10L))
  }

  test("registry lists the matlab kind") {
    assert(SourceRegistry.kinds.contains("indexed_h5_from_matlab"))
  }

  test("adoption normalizes a reference-convention (exclusive-end) bin_index") {
    // the reference's consumers slice h5f[field][i0:i1] Python-style
    // (geo_index.py:617-629), so files from that ecosystem store
    // exclusive ends; graft stores inclusive.  The tell: an exclusive
    // file's max end equals the data row count.  Both conventions
    // must adopt to the same run set — one row per point, none
    // dropped, none double-read.
    val n = 20
    val xs = (0 until n).map(i => if (i < 10) 100.0 else 900.0).toArray
    def fileWith(ends: Array[Long]): String = {
      val w = new Hdf5.Writer
      w.doubles("/x", xs)
      w.doubles("/y", Array.fill(n)(100.0))
      w.doubles("/time", (0 until n).map(_.toDouble).toArray)
      w.doubles("/INDEX/bin_x", Array(0.0, 1000.0))
      w.doubles("/INDEX/bin_y", Array(0.0, 0.0))
      w.longs("/INDEX/bin_index", Array(0L, 10L) ++ ends, dims = Seq(2L, 2L))
      val p = java.nio.file.Files.createTempDirectory("conv").toString + "/f.h5"
      java.nio.file.Files.write(java.nio.file.Paths.get(p), w.toBytes)
      p
    }
    val inclusive = fileWith(Array(9L, 19L))   // graft convention
    val exclusive = fileWith(Array(10L, 20L))  // reference convention
    val a = IndexedH5.adopt(spark, inclusive).orderBy("bin_x")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val b = IndexedH5.adopt(spark, exclusive).orderBy("bin_x")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(a == Seq((10L, 0L, 9L), (10L, 10L, 19L)))
    assert(b == a, s"exclusive-end file adopted differently: $b")
    // and the normalized runs read EVERY row exactly once from the
    // foreign file — the interop the off-by-one would break
    val got = IndexedH5.readData(spark, exclusive, Seq("x", "time"),
      runs = Seq((0L, 9L), (10L, 19L)))
      .select("time").as[Double].collect().sorted.toSeq
    assert(got == (0 until n).map(_.toDouble))
    // the AMBIGUOUS shape — a foreign exclusive file whose bins stop
    // short of the last data row — is indistinguishable under Auto
    // (adoption warns and assumes inclusive); the explicit flag is
    // the escape hatch and must override the inference both ways
    val short = fileWith(Array(10L, 18L)) // exclusive ends, 2 tail rows unindexed
    val auto = IndexedH5.adopt(spark, short).orderBy("bin_x")
      .collect().map(r => (r.getLong(3), r.getLong(4))).toSeq
    assert(auto == Seq((0L, 10L), (10L, 18L))) // read as inclusive: one extra row/bin
    val pinned = IndexedH5.adopt(spark, short, ends = IndexedH5.Exclusive)
      .orderBy("bin_x")
      .collect().map(r => (r.getLong(3), r.getLong(4))).toSeq
    assert(pinned == Seq((0L, 9L), (10L, 17L)),
      s"explicit Exclusive did not override inference: $pinned")
    // and Inclusive pins the graft convention even when the max end
    // happens to equal the row count (a graft file whose last bin
    // ends exactly at rows-1 can't occur with end==rows, so this is
    // the foreign-producer override surface only)
    val pinnedIncl = IndexedH5.adopt(spark, exclusive, ends = IndexedH5.Inclusive)
      .orderBy("bin_x")
      .collect().map(r => (r.getLong(3), r.getLong(4))).toSeq
    assert(pinnedIncl == Seq((0L, 10L), (10L, 20L)))
  }
}
