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

  // ------------------------------------------------------------------
  // Writer conformance: an INDEPENDENT byte-walk of writer output
  // against the public format spec's invariants — deliberately NOT
  // using the Reader, whose leniencies could mask a non-conformant
  // writer (the GeoTiff LZW lesson).  Checks: superblock fields and
  // EOF; v1 object headers (version, 8-aligned message sizes, sizes
  // summing to the declared header size); group B-trees and SNODs
  // sized within the superblock's K capacities AND allocated to the
  // full K-implied node size (strict readers size nodes from K);
  // symbol entries name-sorted; local heap bounds; chunk B-trees with
  // strictly ascending element offsets, a final key at the dataset
  // extent, chunk extents inside the file, and fletcher32 trailers
  // verified with a local checksum (not the codec's).
  // ------------------------------------------------------------------
  private def conformanceWalk(b: Array[Byte]): Unit = {
    def u(off: Long, n: Int): Long = {
      var v = 0L; var k = 0
      while (k < n) { v |= (b(off.toInt + k) & 0xffL) << (8 * k); k += 1 }
      v
    }
    def fail(msg: String): Nothing = throw new AssertionError(s"conformance: $msg")
    def sig(at: Long, s: String): Unit =
      if (!(0 until s.length).forall(i => b(at.toInt + i) == s(i).toByte))
        fail(s"expected '$s' signature at $at")
    // local fletcher32 straight from H5checksum.c (independent copy)
    def fletcher(d: Array[Byte], from: Int, until: Int): Long = {
      var s1 = 0L; var s2 = 0L; var off = from; var len = (until - from) / 2
      while (len > 0) {
        var t = math.min(360, len); len -= t
        while (t > 0) {
          s1 = (s1 + (((d(off) & 0xffL) << 8) | (d(off + 1) & 0xffL))) & 0xffffffffL
          off += 2; s2 = (s2 + s1) & 0xffffffffL; t -= 1
        }
        s1 = (s1 & 0xffff) + (s1 >>> 16); s2 = (s2 & 0xffff) + (s2 >>> 16)
      }
      if ((until - from) % 2 == 1) {
        s1 = (s1 + ((d(until - 1) & 0xffL) << 8)) & 0xffffffffL
        s2 = (s2 + s1) & 0xffffffffL
        s1 = (s1 & 0xffff) + (s1 >>> 16); s2 = (s2 & 0xffff) + (s2 >>> 16)
      }
      s1 = (s1 & 0xffff) + (s1 >>> 16); s2 = (s2 & 0xffff) + (s2 >>> 16)
      ((s2 << 16) | s1) & 0xffffffffL
    }
    // §II superblock v0
    if ((b(0) & 0xff) != 0x89) fail("superblock signature")
    sig(1, "HDF")
    if (u(8, 1) != 0) fail("superblock version")
    if (u(13, 1) != 8 || u(14, 1) != 8) fail("offset/length sizes")
    val leafK = u(16, 2).toInt
    val internalK = u(18, 2).toInt
    if (leafK <= 0 || internalK <= 0) fail("superblock K fields")
    if (u(24, 8) != 0) fail("base address")
    val eof = u(40, 8)
    if (eof != b.length) fail(s"EOF address $eof != file length ${b.length}")
    val rootOH = u(64, 8)

    // v1 object header: returns (type, bodyOff, size) messages
    def messages(at: Long): Seq[(Int, Long, Int)] = {
      if (u(at, 1) != 1) fail(s"object header version at $at")
      val nmsg = u(at + 2, 2).toInt
      val declared = u(at + 8, 4)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Int)]
      var walked = 0L
      var blocks = List((at + 16, declared))
      while (blocks.nonEmpty && out.size < nmsg) {
        val (s0, l0) = blocks.head; blocks = blocks.tail
        var p = s0
        while (p + 8 <= s0 + l0 && out.size < nmsg) {
          val typ = u(p, 2).toInt; val size = u(p + 2, 2).toInt
          if (size % 8 != 0) fail(s"message size $size not 8-aligned at $p")
          if (typ == 0x10) blocks = blocks :+ ((u(p + 8, 8), u(p + 16, 8)))
          out += ((typ, p + 8, size))
          walked += size + 8
          p += 8 + size
        }
      }
      if (out.size != nmsg) fail(s"header at $at declares $nmsg messages, found ${out.size}")
      if (walked != declared) fail(s"header size $declared != walked $walked at $at")
      out.toSeq
    }

    def heapName(dataAddr: Long, off: Long): String = {
      var e = (dataAddr + off).toInt
      while (b(e) != 0) e += 1
      new String(b, (dataAddr + off).toInt, (e - dataAddr - off).toInt, "UTF-8")
    }

    def walkObject(oh: Long): Unit = {
      val msgs = messages(oh)
      msgs.find(_._1 == 0x11) match {
        case Some((_, body, _)) => // group: symbol table
          val btree = u(body, 8); val heap = u(body + 8, 8)
          sig(heap, "HEAP")
          if (u(heap + 4, 1) != 0) fail("local heap version")
          val heapSz = u(heap + 8, 8); val heapData = u(heap + 24, 8)
          if (heapData + heapSz > eof) fail("local heap data past EOF")
          def walkGroupBt(at: Long): Unit = {
            sig(at, "TREE")
            if (u(at + 4, 1) != 0) fail("group btree node type")
            val lvl = u(at + 5, 1).toInt
            val n = u(at + 6, 2).toInt
            if (n > 2 * internalK) fail(s"group btree entries $n > 2K=${2 * internalK}")
            // node allocated to the K-implied capacity: header +
            // (2K+1) keys + 2K children must lie inside the file
            if (at + 24 + (2 * internalK + 1) * 8 + 2 * internalK * 8 > eof)
              fail("group btree node not allocated to K capacity")
            var p = at + 24 + 8 // siblings + key0
            (0 until n).foreach { _ =>
              val child = u(p, 8); p += 16 // child + following key
              if (lvl > 0) walkGroupBt(child)
              else {
                sig(child, "SNOD")
                if (u(child + 4, 1) != 1) fail("SNOD version")
                val ne = u(child + 6, 2).toInt
                if (ne > 2 * leafK) fail(s"SNOD fanout $ne > superblock 2K=${2 * leafK}")
                if (child + 8 + 2 * leafK * 40 > eof)
                  fail("SNOD not allocated to 2K capacity")
                var names = List.empty[String]
                var q = child + 8
                (0 until ne).foreach { _ =>
                  val nm = heapName(heapData, u(q, 8))
                  names = nm :: names
                  walkObject(u(q + 8, 8))
                  q += 40
                }
                val asc = names.reverse
                if (asc != asc.sorted) fail(s"SNOD names not sorted: $asc")
              }
            }
          }
          walkGroupBt(btree)
        case None => // dataset: dataspace + layout
          val dims = msgs.find(_._1 == 0x01).map { case (_, body, _) =>
            val rank = u(body + 1, 1).toInt
            Array.tabulate(rank)(i => u(body + 8 + 8L * i, 8))
          }.getOrElse(fail(s"dataset at $oh lacks a dataspace"))
          val hasFletcher = msgs.find(_._1 == 0x0B).exists { case (_, body, _) =>
            val nf = u(body + 1, 1).toInt
            var p = body + 8; var found = false
            (0 until nf).foreach { _ =>
              val id = u(p, 2).toInt   // v1 entry: id, namelen, flags, ncd
              val ncd = u(p + 6, 2).toInt
              if (id == 3) found = true
              p += 8 + 4L * ncd + (if (ncd % 2 == 1) 4 else 0)
            }
            found
          }
          msgs.find(_._1 == 0x08).foreach { case (_, body, _) =>
            if (u(body, 1) != 3) fail("layout message version")
            u(body + 1, 1).toInt match {
              case 1 => // contiguous
                val addr = u(body + 2, 8); val sz = u(body + 10, 8)
                if (addr != -1L && addr + sz > eof) fail("contiguous data past EOF")
              case 2 => // chunked
                val bt = u(body + 3, 8)
                val chunkRows = u(body + 11, 4)
                sig(bt, "TREE")
                if (u(bt + 4, 1) != 1) fail("chunk btree node type")
                val n = u(bt + 6, 2).toInt
                var p = bt + 24
                var prevOff = -1L
                (0 until n).foreach { _ =>
                  val stored = u(p, 4)
                  val off = u(p + 8, 8)
                  val child = u(p + 24, 8)
                  if (off <= prevOff) fail(s"chunk keys not ascending at $p")
                  if (off % chunkRows != 0) fail("chunk offset not a chunk multiple")
                  prevOff = off
                  if (child + stored > eof) fail("chunk data past EOF")
                  if (hasFletcher) {
                    val bodyEnd = (child + stored - 4).toInt
                    val want = u(child + stored - 4, 4)
                    val got = fletcher(b, child.toInt, bodyEnd)
                    if (want != got) fail(f"fletcher trailer $want%08x != $got%08x")
                  }
                  p += 32
                }
                if (n > 0 && u(p + 8, 8) != dims(0))
                  fail(s"final chunk key ${u(p + 8, 8)} != extent ${dims(0)}")
              case 0 => () // compact
              case other => fail(s"layout class $other")
            }
          }
      }
    }
    walkObject(rootOH)
  }

  private def conformanceSubject(): Array[Byte] = {
    val w = new Hdf5.Writer
    w.attrS("", "note", "conformance subject")
    // multi-SNOD group (300 entries > 128/SNOD)
    (0 until 300).foreach(i => w.doubles(f"/bins/b$i%04d", Array(i.toDouble)))
    w.doubles("/d/lat", Array.tabulate(5000)(_ * 0.5), chunkRows = 512, gzip = 6)
    w.doubles("/d/lon", Array.tabulate(5000)(_ * 0.25), chunkRows = 512, gzip = 6,
      shuffle = true)
    w.longs("/d/seg", Array.tabulate(5000)(_.toLong * 3), chunkRows = 512,
      gzip = 4, fletcher = true)
    w.doubles("/d/h", Array.tabulate(100)(_.toDouble)) // contiguous
    w.doubles("/grid", Array.tabulate(60)(_.toDouble), dims = Seq(6, 10))
    w.attrD("/d/lat", "scale", 1.5)
    w.attrS("/d", "kind", "beam")
    w.toBytes
  }

  test("writer output passes an independent format-invariant byte walk") {
    conformanceWalk(conformanceSubject())
  }

  test("the byte walk rejects deliberately corrupted structures") {
    val good = conformanceSubject()
    def find(sig: String, from: Int = 0): Int = {
      var i = from
      while (i < good.length - 4 &&
        !(0 until 4).forall(k => good(i + k) == sig(k).toByte)) i += 1
      require(i < good.length - 4, s"no $sig found")
      i
    }
    // 1. SNOD fanout above the superblock's 2K — a mis-sized node
    val c1 = good.clone()
    val snod = find("SNOD")
    c1(snod + 6) = 0xff.toByte; c1(snod + 7) = 0x00
    intercept[AssertionError](conformanceWalk(c1))
    // 2. SNOD symbol order broken (names must be B-tree-sorted)
    val c2 = good.clone()
    val e0 = snod + 8
    val tmp = java.util.Arrays.copyOfRange(c2, e0, e0 + 40)
    System.arraycopy(c2, e0 + 40, c2, e0, 40)
    System.arraycopy(tmp, 0, c2, e0 + 40, 40)
    intercept[AssertionError](conformanceWalk(c2))
    // 3. mis-padded allocation: EOF declared shorter than the
    //    K-implied node sizes require (truncation)
    val c3 = java.util.Arrays.copyOf(good, good.length - 16)
    intercept[AssertionError](conformanceWalk(c3))
    // 4. chunk B-tree key order broken
    val c4 = good.clone()
    var bt = find("TREE")
    while ((c4(bt + 4) & 0xff) != 1) bt = find("TREE", bt + 4)
    val k0 = bt + 24
    val t2 = java.util.Arrays.copyOfRange(c4, k0, k0 + 32)
    System.arraycopy(c4, k0 + 32, c4, k0, 32)
    System.arraycopy(t2, 0, c4, k0 + 32, 32)
    intercept[AssertionError](conformanceWalk(c4))
    // 5. a flipped bit inside a fletcher-protected chunk
    val c5 = good.clone()
    val r = new Hdf5.Reader(good)
    val info = r.datasetInfo("/d/seg")
    // corrupt one byte of the first stored chunk (address from the
    // reader is fine here — the CHECK is the independent walker's)
    val btAddr = info.btreeAddr
    val chunk0 = {
      var v = 0L; var k = 0
      while (k < 8) { v |= (good(btAddr.toInt + 48 + k) & 0xffL) << (8 * k); k += 1 }
      v
    }
    c5(chunk0.toInt + 5) = (c5(chunk0.toInt + 5) ^ 0x40).toByte
    intercept[AssertionError](conformanceWalk(c5))
    // and the untouched original still passes after all that
    conformanceWalk(good)
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

  test("childless group encodes a 0-entry B-tree node and round-trips") {
    // regression: the multi-level rewrite spun forever on an empty
    // group (grouped() of an empty seq yields no node groups) — the
    // exact shape GeoIndexH5.write produces for an index with no runs
    val w = new Hdf5.Writer
    w.group("/index")
    w.attrD("/index", "delta", 400.0)
    w.doubles("/other", Array(1.0, 2.0))
    val bytes = w.toBytes
    val r = new Hdf5.Reader(bytes)
    assert(r.groups.contains("/index"))
    assert(r.attrs("/index")("delta").asInstanceOf[Hdf5.NumAttr].doubles.head == 400.0)
    conformanceWalk(bytes)
  }

  test("group past one node's 2K*2K capacity gets a multi-LEVEL B-tree, walk-clean") {
    // 4096 = 2*InternalK SNOD children × 2*LeafK symbols is the most
    // ONE level-0 node addresses; 4500 forces a level-1 root (the
    // shape a reference index file with one subgroup per bin reaches)
    val w = new Hdf5.Writer
    (0 until 4500).foreach { i => w.doubles(f"/bins/b$i%05d/z", Array(i.toDouble)) }
    val bytes = w.toBytes
    val r = new Hdf5.Reader(bytes)
    assert(r.groups.count(_.startsWith("/bins/")) == 4500)
    assert(r.readDoubles("/bins/b04321/z").head == 4321.0)
    // the /bins group's B-tree root must be level ≥ 1: find the TREE
    // node whose entry count × SNOD capacity cannot cover 4500
    var i = 0; var sawInternal = false
    while (i < bytes.length - 8 && !sawInternal) {
      if (bytes(i) == 'T' && bytes(i + 1) == 'R' && bytes(i + 2) == 'E' &&
        bytes(i + 3) == 'E' && bytes(i + 4) == 0 && (bytes(i + 5) & 0xff) >= 1)
        sawInternal = true
      i += 1
    }
    assert(sawInternal, "no internal (level>=1) group B-tree node written")
    conformanceWalk(bytes)
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
