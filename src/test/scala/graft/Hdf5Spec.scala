package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Hdf5
import graft.sources.Hdf5.{NumAttr, StrAttr}

/** Byte-level coverage for the self-contained HDF5 codec.  The
  * cross-implementation evidence is the REAL libhdf5-written granule
  * shipped inside the reference repo (surfmask_20180608_001_01.h5 —
  * superblock v0, v1 object headers with continuations, symbol-table
  * groups, chunked+deflate datasets, array attributes): a reader
  * that only round-tripped its own writer could not open it.
  */
class Hdf5Spec extends AnyFunSuite {

  private val RealFile = "/root/reference/surfmask_20180608_001_01.h5"

  test("writer→reader round-trips groups, layouts, filters, dtypes") {
    val n = 1000
    val ds = Array.tabulate(n)(i => i * 1.5 - 3.0)
    val ls = Array.tabulate(n)(i => i.toLong * 1234567 - 42)
    val is = Array.tabulate(n)(i => i * 31 - 7)
    val w = new Hdf5.Writer
    w.group("/g1/land_ice_segments")
    w.doubles("/g1/land_ice_segments/h_li", ds)                        // contiguous
    w.doubles("/g1/land_ice_segments/lat", ds, chunkRows = 300, gzip = 6) // chunked+gzip (edge chunk)
    w.doubles("/g1/land_ice_segments/lon", ds, chunkRows = 250, gzip = 6, shuffle = true)
    w.longs("/g1/land_ice_segments/seg", ls, chunkRows = 256, gzip = 4, fletcher = true)
    w.ints("/g1/counts", is)
    w.doubles("/grid", Array.tabulate(60)(_.toDouble), dims = Seq(6, 10))
    val r = new Hdf5.Reader(w.toBytes)
    assert(r.groups.toSet.intersect(Set("/g1", "/g1/land_ice_segments")) ==
      Set("/g1", "/g1/land_ice_segments"))
    assert(r.datasets.toSet == Set("/g1/land_ice_segments/h_li",
      "/g1/land_ice_segments/lat", "/g1/land_ice_segments/lon",
      "/g1/land_ice_segments/seg", "/g1/counts", "/grid"))
    assert(r.readDoubles("/g1/land_ice_segments/h_li").sameElements(ds))
    assert(r.readDoubles("/g1/land_ice_segments/lat").sameElements(ds))
    assert(r.readDoubles("/g1/land_ice_segments/lon").sameElements(ds))
    assert(r.readLongs("/g1/land_ice_segments/seg").sameElements(ls))
    assert(r.readLongs("/g1/counts").sameElements(is.map(_.toLong)))
    assert(r.dims("/grid").toSeq == Seq(6L, 10L))
    assert(r.readDoubles("/grid").sameElements(Array.tabulate(60)(_.toDouble)))
  }

  test("run-sliced reads return exact slices and decode only overlapping chunks") {
    val n = 20000
    val ds = Array.tabulate(n)(i => i * 0.25 - 100.0)
    val ls = Array.tabulate(n)(i => i.toLong * 7 - 3)
    val w = new Hdf5.Writer
    w.doubles("/chunked", ds, chunkRows = 512, gzip = 6, shuffle = true) // 40 chunks
    w.longs("/chunked_l", ls, chunkRows = 512, gzip = 4, fletcher = true)
    w.doubles("/contig", ds)
    val bytes = w.toBytes

    // multiple disjoint runs, including two runs inside ONE chunk
    // (positions 100-120 and 300-350 both live in chunk 0) and a run
    // crossing a chunk boundary (1000-1100 spans chunks 1-2)
    val runs = Seq((100L, 120L), (300L, 350L), (1000L, 1100L), (9999L, 10050L))
    val expect = runs.flatMap { case (s, e) => (s to e).map(i => ds(i.toInt)) }.toArray
    val expectL = runs.flatMap { case (s, e) => (s to e).map(i => ls(i.toInt)) }.toArray

    val r1 = new Hdf5.Reader(bytes)
    assert(r1.readDoublesRuns("/chunked", runs).sameElements(expect))
    // chunks touched: #0 (both sub-runs — decoded ONCE), #1 and #2
    // (the 1000-1100 run crosses their boundary at 1024), and #19
    // (9999-10050 sits inside [9728,10240)) — 4 of 40
    assert(r1.chunksDecoded == 4, s"decoded ${r1.chunksDecoded} chunks, expected 4")

    val r2 = new Hdf5.Reader(bytes)
    assert(r2.readLongsRuns("/chunked_l", runs).sameElements(expectL))
    assert(r2.chunksDecoded == 4)

    // contiguous layout slices without touching the chunk machinery
    val r3 = new Hdf5.Reader(bytes)
    assert(r3.readDoublesRuns("/contig", runs).sameElements(expect))
    assert(r3.chunksDecoded == 0)

    // whole-dataset read for scale contrast: all 40 chunks decode
    val r4 = new Hdf5.Reader(bytes)
    assert(r4.readDoubles("/chunked").sameElements(ds))
    assert(r4.chunksDecoded == 40)

    // out-of-order / overlapping runs refuse loudly
    val r5 = new Hdf5.Reader(bytes)
    intercept[IllegalArgumentException] {
      r5.readDoublesRuns("/chunked", Seq((100L, 200L), (150L, 250L)))
    }
    intercept[IllegalArgumentException] {
      r5.readDoublesRuns("/chunked", Seq((0L, n.toLong))) // past the end
    }
  }

  test("attributes round-trip: scalar/array numerics and strings") {
    val w = new Hdf5.Writer
    w.group("/index")
    w.attrD("/index", "delta", 1000.0)
    w.attrD("/index", "frac", 0.25)
    w.attrL("/index", "n_files", 3L)
    w.attrS("/index", "SRS_proj4", "+proj=stere +lat_0=-90 +lat_ts=-71")
    w.attr("/index", "lat0", NumAttr(Array(-90.0, -70.0, -50.0), Array(-90L, -70L, -50L)))
    w.attr("/index", "names", StrAttr(Array("tile_a", "tile_bb", "tile_ccc")))
    w.attrS("", "root_note", "hello")
    w.doubles("/index/z", Array(1.0, 2.0))
    w.attrD("/index/z", "_FillValue", -9999.0)
    val r = new Hdf5.Reader(w.toBytes)
    val a = r.attrs("/index")
    assert(a("delta").asInstanceOf[NumAttr].doubles.head == 1000.0)
    assert(a("frac").asInstanceOf[NumAttr].doubles.head == 0.25)
    assert(a("n_files").asInstanceOf[NumAttr].longs.head == 3L)
    assert(a("SRS_proj4").asInstanceOf[StrAttr].strings.head ==
      "+proj=stere +lat_0=-90 +lat_ts=-71")
    assert(a("lat0").asInstanceOf[NumAttr].doubles.toSeq == Seq(-90.0, -70.0, -50.0))
    assert(a("names").asInstanceOf[StrAttr].strings.toSeq ==
      Seq("tile_a", "tile_bb", "tile_ccc"))
    assert(r.attrs("")("root_note").asInstanceOf[StrAttr].strings.head == "hello")
    assert(r.attrs("/index/z")("_FillValue").asInstanceOf[NumAttr].doubles.head == -9999.0)
  }

  test("group with hundreds of entries survives the multi-SNOD B-tree") {
    val w = new Hdf5.Writer
    (0 until 500).foreach { i =>
      w.doubles(f"/bins/bin_$i%04d/z", Array(i.toDouble))
    }
    val r = new Hdf5.Reader(w.toBytes)
    val bins = r.groups.filter(g => g.startsWith("/bins/")).toSeq
    assert(bins.size == 500)
    assert(r.readDoubles("/bins/bin_0123/z").head == 123.0)
    assert(r.readDoubles("/bins/bin_0499/z").head == 499.0)
  }

  test("REAL libhdf5 granule: structure, attrs, chunked+deflate tiles") {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(RealFile))
    val r = new Hdf5.Reader(bytes)
    val tiles = r.datasets.filter(_.startsWith("/tile_"))
    assert(tiles.size == 162, s"expected the full 9x18 tile grid, got ${tiles.size}")
    // TILE_INDEX group attrs drive read_surfmask.py:150-160
    val ti = r.attrs("/TILE_INDEX")
    val nlat = ti("N_LAT").asInstanceOf[NumAttr].longs
    assert(nlat.length == 162 && nlat.forall(_ == 400L))
    assert(ti("N_LON").asInstanceOf[NumAttr].longs.forall(_ == 400L))
    assert(ti("LAT0").asInstanceOf[NumAttr].doubles.length == 162)
    val names = ti("NAME").asInstanceOf[StrAttr].strings
    assert(names.length == 162 && names.forall(_.startsWith("tile_")))
    assert(names.toSet == tiles.map(_.stripPrefix("/")).toSet)
    // chunked + deflate decode, pinned against an independent python
    // walk of the same bytes (land-bit fractions)
    val info = r.datasetInfo("/tile_90S000E")
    assert(info.dims.toSeq == Seq(400L, 400L))
    assert(info.filters.exists(_._1 == 1), "mask tiles are deflate-compressed")
    def landFrac(p: String): Double = {
      val v = r.readLongs(p)
      v.count(x => (x & 1L) == 1L).toDouble / v.length
    }
    assert(landFrac("/tile_90S000E") == 1.0) // Antarctica: all land bit
    assert(math.abs(landFrac("/tile_70N020E") - 0.136) < 0.002)
    assert(math.abs(landFrac("/tile_30N000E") - 0.743) < 0.002)
    // root attrs (v1 header continuation path) include VARIABLE-length
    // strings resolved through the global heap — values pinned by an
    // independent python walk of the same bytes
    val root = r.attrs("")
    assert(root("ShortName").asInstanceOf[StrAttr].strings.head == "ANC12-01")
    assert(root("NAME").asInstanceOf[StrAttr].strings.head ==
      "surfmask_20180608_001_01.h5")
    assert(root("ProductionDateTime").asInstanceOf[StrAttr].strings.head ==
      "2018-06-08T19:56:37")
    // and a fixed-length (class 3) string attr from the same header
    assert(root("contributor_role").asInstanceOf[StrAttr].strings.head.nonEmpty)
  }
}
