package graft

import org.apache.spark.sql.functions._
import graft.sources.GeoTiff
import graft.sources.GeoTiff.Georef

/** Byte-level GeoTIFF codec + the distributed read/write surface
  * (mapData.py:39-158 semantics).
  */
class GeoTiffSpec extends SparkSpec {

  private def sampleBand(nx: Int, ny: Int)(f: (Int, Int) => Double): Array[Double] = {
    val a = new Array[Double](nx * ny)
    for (r <- 0 until ny; c <- 0 until nx) a(r * nx + c) = f(r, c)
    a
  }
  private val ref = Georef(3031, 100.0, 100.0, -50.0, 1250.0)

  test("float64 round-trip is bit-exact for every compression, striped and tiled") {
    val (nx, ny) = (37, 23)
    val band = sampleBand(nx, ny)((r, c) =>
      if ((r * 31 + c) % 11 == 0) Double.NaN else math.sin(r * 0.7) * 1e6 + c * 1e-9)
    for (comp <- Seq("none", "deflate", "lzw"); tiled <- Seq(false, true)) {
      val bytes = GeoTiff.encode(Array(band), nx, ny, ref,
        compression = comp, tiled = tiled)
      val d = GeoTiff.decode(bytes)
      assert(d.nx == nx && d.ny == ny && d.bands == 1, s"$comp tiled=$tiled")
      assert(d.ref == ref, s"$comp tiled=$tiled georef")
      assert(d.nodata.exists(_.isNaN), s"$comp tiled=$tiled nodata")
      band.indices.foreach { i =>
        val (a, b) = (band(i), d.samples(0)(i))
        assert(java.lang.Double.doubleToLongBits(a) ==
               java.lang.Double.doubleToLongBits(b),
          s"$comp tiled=$tiled sample $i: $a vs $b")
      }
    }
  }

  test("multi-band + multi-strip layouts survive the round-trip") {
    val (nx, ny) = (19, 12)
    val b0 = sampleBand(nx, ny)((r, c) => r * 100.0 + c)
    val b1 = sampleBand(nx, ny)((r, c) => -(r + c * 1000.0))
    val bytes = GeoTiff.encode(Array(b0, b1), nx, ny, ref,
      compression = "deflate", rowsPerStrip = 3)
    val d = GeoTiff.decode(bytes)
    assert(d.bands == 2)
    assert(d.samples(0).sameElements(b0) && d.samples(1).sameElements(b1))
  }

  test("pixel-center geometry matches from_geotif (mapData.py:56-59)") {
    val d = GeoTiff.decode(GeoTiff.encode(
      Array(sampleBand(4, 3)((r, c) => r + c)), 4, 3, ref, compression = "none"))
    // x = GT0 + GT1*(i+0.5); y = GT3 + GT5*(j+0.5), GT5 negative
    assert(d.xCenter(0) == 0.0 && d.xCenter(3) == 300.0)
    assert(d.yCenter(0) == 1200.0 && d.yCenter(2) == 1000.0)
  }

  test("decoder handles foreign layouts: big-endian, uint8, horizontal predictor") {
    // hand-assembled 3x2 big-endian uint8 striped TIFF with predictor=2
    import java.nio.{ByteBuffer, ByteOrder}
    val raw = Array[Byte](10, 5, -10, 7, 3, -3) // rows: (10,15,5), (7,10,7) after undiff
    val bb = ByteBuffer.allocate(300).order(ByteOrder.BIG_ENDIAN)
    bb.put('M'.toByte).put('M'.toByte).putShort(42).putInt(16) // header, IFD at 16
    bb.position(8); bb.put(raw) // strip data at offset 8
    bb.position(16)
    val entries = Seq( // (tag, type, count, value)
      (256, 3, 1, 3), (257, 3, 1, 2), (258, 3, 1, 8), (259, 3, 1, 1),
      (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1), (278, 4, 1, 2),
      (279, 4, 1, 6), (284, 3, 1, 1), (317, 3, 1, 2), (339, 3, 1, 1),
      (33550, 12, 3, 220), (33922, 12, 6, 244))
    bb.putShort(entries.length.toShort)
    entries.foreach { case (tag, typ, count, v) =>
      bb.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      if (typ == 3) { bb.putShort(v.toShort); bb.putShort(0) } else bb.putInt(v)
    }
    bb.putInt(0) // next IFD
    bb.position(220); Seq(100.0, 100.0, 0.0).foreach(bb.putDouble)
    bb.position(244); Seq(0.0, 0.0, 0.0, -50.0, 1250.0, 0.0).foreach(bb.putDouble)
    val d = GeoTiff.decode(bb.array())
    assert(d.nx == 3 && d.ny == 2 && d.bands == 1)
    assert(d.samples(0).toSeq == Seq(10.0, 15.0, 5.0, 7.0, 10.0, 7.0))
    assert(d.ref.sx == 100.0 && d.ref.originX == -50.0 && d.ref.epsg == 0)
  }

  test("hand-assembled big-endian 16-bit predictor-2 strip decodes with BE carry semantics") {
    // 3x2 uint16, diffs chosen to force carries across the byte
    // boundary: row1 values 4096,3840,4352 → diffs 4096,-256,512;
    // row2 values 1,65535,0 → diffs 1,65534,1 (mod 2^16).  A decoder
    // that accumulates the bytes little-endian (ignoring the file's
    // MM order) yields 3841/4353 instead of 3840/4352.
    import java.nio.{ByteBuffer, ByteOrder}
    val diffs = Array(0x1000, 0xFF00, 0x0200, 0x0001, 0xFFFE, 0x0001)
    val bb = ByteBuffer.allocate(320).order(ByteOrder.BIG_ENDIAN)
    bb.put('M'.toByte).put('M'.toByte).putShort(42).putInt(20) // IFD at 20
    bb.position(8); diffs.foreach(v => bb.putShort(v.toShort)) // strip at 8, 12 bytes
    bb.position(20)
    val entries = Seq( // (tag, type, count, value)
      (256, 3, 1, 3), (257, 3, 1, 2), (258, 3, 1, 16), (259, 3, 1, 1),
      (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1), (278, 4, 1, 2),
      (279, 4, 1, 12), (284, 3, 1, 1), (317, 3, 1, 2), (339, 3, 1, 1),
      (33550, 12, 3, 240), (33922, 12, 6, 264))
    bb.putShort(entries.length.toShort)
    entries.foreach { case (tag, typ, count, v) =>
      bb.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      if (typ == 3) { bb.putShort(v.toShort); bb.putShort(0) } else bb.putInt(v)
    }
    bb.putInt(0) // next IFD
    bb.position(240); Seq(100.0, 100.0, 0.0).foreach(bb.putDouble)
    bb.position(264); Seq(0.0, 0.0, 0.0, -50.0, 1250.0, 0.0).foreach(bb.putDouble)
    val d = GeoTiff.decode(bb.array())
    assert(d.nx == 3 && d.ny == 2)
    assert(d.samples(0).toSeq == Seq(4096.0, 3840.0, 4352.0, 1.0, 65535.0, 0.0))
  }

  test("refusals are loud: BigTIFF and non-TIFF input") {
    val ok = GeoTiff.encode(Array(sampleBand(2, 2)((r, c) => 1.0)), 2, 2, ref)
    val big = ok.clone(); big(2) = 43 // magic 43 = BigTIFF
    assert(intercept[IllegalArgumentException](GeoTiff.decode(big))
      .getMessage.contains("BigTIFF"))
    assert(intercept[IllegalArgumentException](
      GeoTiff.decode("garbage-not-a-tiff-at-all".getBytes)).getMessage.contains("TIFF"))
  }

  test("writeTiles→read round-trips the events DEM grid exactly, executor-side") {
    val grid = graft.sources.PointSources.rasterize(
      graft.core.Tables.eventsPoints(spark, sf), 100.0).select("gx", "gy", "gz")
    val dir = java.nio.file.Files.createTempDirectory("geotiff_rt").toString
    val written = GeoTiff.writeTiles(grid, dir, epsg = 3031,
      delta = 100.0, tileSize = 800.0)
    assert(written.nonEmpty && written.forall(_.cells > 0))
    // every tile landed in its own file, named by its tile key
    assert(written.map(_.file).distinct.size == written.size)
    val back = GeoTiff.readGrid(spark, dir)
    assert(back.except(grid).isEmpty && grid.except(back).isEmpty)
    // sidecar carries the CRS the way RasterSink's does
    val meta = graft.sources.RasterSink.readMeta(dir)
    assert(meta.epsg == 3031 && meta.delta == 100.0)
  }

  test("bounds + skip follow mapData.py:60-79 window-then-stride semantics") {
    val (nx, ny) = (10, 6)
    val band = sampleBand(nx, ny)((r, c) => r * 1000.0 + c)
    val dir = java.nio.file.Files.createTempDirectory("geotiff_bs").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "t.tif"),
      GeoTiff.encode(Array(band), nx, ny, ref))
    // centers: x = 0,100..900 ; y = 1200,1100..700
    val cells = GeoTiff.read(spark, dir,
      bounds = Some(((100.0, 600.0), (800.0, 1100.0))), skip = 2).collect()
    // window: cols 1..6, rows 1..4 (y in [800,1100]); stride 2 of each
    val xs = cells.map(_.x).distinct.sorted
    val ys = cells.map(_.y).distinct.sorted
    assert(xs.toSeq == Seq(100.0, 300.0, 500.0))
    assert(ys.toSeq == Seq(900.0, 1100.0))
    // values preserved at the kept cells
    assert(cells.forall(c => c.v == ((1200.0 - c.y) / 100.0) * 1000.0 + c.x / 100.0))
  }
}
