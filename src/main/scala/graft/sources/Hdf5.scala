package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}

/** Self-contained HDF5 container IO — the byte-level layer under the
  * reference's PRIMARY on-disk format: every point reader in the
  * reference opens `.h5` via h5py (ATL06_data.py:92 `from_file`,
  * geo_index.py:174-229 index files, read_surfmask.py:150 mask
  * grids, mapData.py:96 rasters).  No libhdf5 exists in a Spark
  * executor, so this implements the subset of the public HDF5 File
  * Format Specification those files actually use:
  *
  *   - reader: superblock v0/v1 (classic) and v2/v3; object headers
  *     v1 (with continuations) and v2 ("OHDR"/"OCHK"); groups as
  *     v1 symbol tables (TREE/SNOD/HEAP) or compact link messages;
  *     dataspace v1/v2; fixed-point + IEEE-float + fixed-string +
  *     variable-string (global heap) datatypes, either endianness;
  *     contiguous, compact, and chunked (B-tree v1) layouts; filter
  *     pipeline with deflate (java.util.zip), shuffle, and
  *     fletcher32; attributes v1/v2/v3.
  *   - writer: classic layout (superblock v0, v1 object headers,
  *     symbol-table groups), contiguous or chunked-with-filters
  *     datasets (f64/i64/i32/u8), scalar/1-D numeric and string
  *     attributes — the shape the reference's own `to_file` writers
  *     produce through h5py.
  *
  * Scale shape: one `.h5` is one GRANULE (an ATL06 pass, a mask
  * file, an index) — bounded by construction, so encode/decode run
  * entirely on executors via the `binaryFile` source + `flatMap`,
  * one file per task unit, embarrassingly parallel across a
  * 10⁶-granule archive; nothing granule-sized ever on the driver.
  */
object Hdf5 {

  // ------------------------------------------------------------- model

  /** Element type: cls 0 fixed-point, 1 float, 3 fixed string,
    * 9 variable-length string.
    */
  final case class Dtype(cls: Int, size: Int, littleEndian: Boolean,
                         signed: Boolean)

  final case class DatasetInfo(path: String, dims: Array[Long], dtype: Dtype,
                               layoutClass: Int, dataAddr: Long, dataSize: Long,
                               chunkDims: Array[Int], btreeAddr: Long,
                               filters: Seq[(Int, Array[Int])],
                               fill: Option[Array[Byte]],
                               compact: Option[Array[Byte]]) {
    def nElems: Long = dims.product
  }

  sealed trait AttrVal
  final case class NumAttr(doubles: Array[Double], longs: Array[Long]) extends AttrVal
  final case class StrAttr(strings: Array[String]) extends AttrVal

  // ------------------------------------------------------------- reader

  final class Reader(b: Array[Byte]) {
    private var offSize = 8
    private var lenSize = 8
    private var rootOH = -1L

    private def u(off: Long, n: Int): Long = {
      var v = 0L; var k = 0
      while (k < n) { v |= (b(off.toInt + k) & 0xffL) << (8 * k); k += 1 }
      v
    }
    private def uo(off: Long): Long = u(off, offSize)
    private def ul(off: Long): Long = u(off, lenSize)
    private def undef(v: Long): Boolean =
      v == (if (offSize == 8) -1L else (1L << (8 * offSize)) - 1)

    // --- superblock (format spec §II): search at 0, 512, 1024, ...
    locally {
      val sig = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')
      var at = 0L
      var found = false
      while (!found && at + 8 < b.length) {
        if ((0 until 8).forall(i => b((at + i).toInt) == sig(i))) found = true
        else at = if (at == 0) 512 else at * 2
      }
      require(found, "not an HDF5 file (no superblock signature)")
      val ver = b((at + 8).toInt) & 0xff
      if (ver <= 1) {
        offSize = b((at + 13).toInt) & 0xff
        lenSize = b((at + 14).toInt) & 0xff
        val fixed = at + 24 + (if (ver == 1) 4 else 0)
        // base, free-space, eof, driver-info, then the root group's
        // symbol table entry (link name offset, object header addr)
        val steAt = fixed + 4L * offSize
        rootOH = uo(steAt + offSize)
      } else {
        offSize = b((at + 9).toInt) & 0xff
        lenSize = b((at + 10).toInt) & 0xff
        rootOH = uo(at + 12 + 3L * offSize)
      }
      require(offSize >= 2 && offSize <= 8 && lenSize >= 2 && lenSize <= 8,
        s"unsupported HDF5 offset/length sizes $offSize/$lenSize")
    }

    // --- object header message collection (v1 §IV.A / v2 OHDR)
    private final case class Msg(typ: Int, body: Long, size: Int)

    private def messages(addr: Long): Seq[Msg] = {
      if (b.length >= addr + 4 && b(addr.toInt) == 'O' && b(addr.toInt + 1) == 'H' &&
          b(addr.toInt + 2) == 'D' && b(addr.toInt + 3) == 'R') messagesV2(addr)
      else messagesV1(addr)
    }

    private def messagesV1(addr: Long): Seq[Msg] = {
      require((b(addr.toInt) & 0xff) == 1, s"unsupported object header at $addr")
      val nmsg = u(addr + 2, 2).toInt
      val hdrSize = u(addr + 8, 4)
      val out = scala.collection.mutable.ArrayBuffer.empty[Msg]
      var blocks = List((addr + 16, hdrSize))
      while (blocks.nonEmpty && out.size < nmsg) {
        val (s, l) = blocks.head; blocks = blocks.tail
        var p = s
        while (p + 8 <= s + l && out.size < nmsg) {
          val typ = u(p, 2).toInt; val size = u(p + 2, 2).toInt
          val body = p + 8
          if (typ == 0x10) blocks = blocks :+ ((uo(body), ul(body + offSize)))
          out += Msg(typ, body, size)
          p = body + size
        }
      }
      out.toSeq
    }

    private def messagesV2(addr: Long): Seq[Msg] = {
      val flags = b(addr.toInt + 5) & 0xff
      var p = addr + 6
      if ((flags & 0x20) != 0) p += 16
      if ((flags & 0x10) != 0) p += 4
      val csBytes = 1 << (flags & 3)
      val chunk0 = u(p, csBytes); p += csBytes
      val corder = (flags & 0x04) != 0
      val hdrLen = if (corder) 6 else 4
      val out = scala.collection.mutable.ArrayBuffer.empty[Msg]
      var blocks = List((p, chunk0))
      while (blocks.nonEmpty) {
        val (s, l) = blocks.head; blocks = blocks.tail
        var q = s
        while (q + hdrLen <= s + l) {
          val typ = b(q.toInt) & 0xff
          val size = u(q + 1, 2).toInt
          q += hdrLen
          if (typ == 0x10) {
            // v2 continuation block: "OCHK" + messages + checksum
            val coff = uo(q); val clen = ul(q + offSize)
            blocks = blocks :+ ((coff + 4, clen - 8))
          }
          if (typ != 0 || size > 0) out += Msg(typ, q, size)
          q += size
        }
      }
      out.toSeq
    }

    // --- directory walk: path -> object header address
    private val objectAddrs = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    private val groupPaths = scala.collection.mutable.LinkedHashSet.empty[String]

    private def walk(path: String, oh: Long, seen: Set[Long]): Unit = {
      if (seen.contains(oh)) return
      objectAddrs(path) = oh
      val msgs = messages(oh)
      val isGroup = msgs.exists(m => m.typ == 0x11 || m.typ == 0x06 || m.typ == 0x02)
      if (!isGroup) return
      groupPaths += path
      msgs.find(_.typ == 0x02).foreach { li =>
        // link info: dense (fractal heap) link storage is out of scope
        val fl = b(li.body.toInt + 1) & 0xff
        val at = li.body + 2 + (if ((fl & 1) != 0) 8 else 0)
        require(undef(uo(at)),
          s"dense (fractal-heap) group links unsupported at '$path'")
      }
      // v2 compact links
      msgs.filter(_.typ == 0x06).foreach { lm =>
        var p = lm.body
        val flags = b(p.toInt + 1) & 0xff
        p += 2
        val ltype = if ((flags & 0x08) != 0) { val t = b(p.toInt) & 0xff; p += 1; t } else 0
        if ((flags & 0x04) != 0) p += 8
        if ((flags & 0x10) != 0) p += 1
        val nlen = u(p, 1 << (flags & 3)).toInt; p += 1 << (flags & 3)
        val name = new String(b, p.toInt, nlen, "UTF-8"); p += nlen
        if (ltype == 0) walk(s"$path/$name", uo(p), seen + oh)
      }
      // v1 symbol table
      msgs.find(_.typ == 0x11).foreach { st =>
        val btree = uo(st.body); val heap = uo(st.body + offSize)
        val heapData = {
          require(b(heap.toInt) == 'H' && b(heap.toInt + 1) == 'E', s"bad local heap at $heap")
          uo(heap + 8 + 2L * lenSize)
        }
        def heapName(off: Long): String = {
          var e = (heapData + off).toInt
          while (b(e) != 0) e += 1
          new String(b, (heapData + off).toInt, e - (heapData + off).toInt, "UTF-8")
        }
        def walkBt(addr: Long): Unit = {
          require(b(addr.toInt) == 'T' && b(addr.toInt + 1) == 'R', s"bad group btree at $addr")
          val lvl = b(addr.toInt + 5) & 0xff
          val n = u(addr + 6, 2).toInt
          var p = addr + 8 + 2L * offSize + lenSize // skip siblings + key0
          var i = 0
          while (i < n) {
            val child = uo(p); p += offSize + lenSize
            if (lvl > 0) walkBt(child)
            else {
              require(b(child.toInt) == 'S' && b(child.toInt + 1) == 'N', s"bad SNOD at $child")
              val ne = u(child + 6, 2).toInt
              var q = child + 8
              var j = 0
              while (j < ne) {
                val nm = heapName(uo(q))
                walk(s"$path/$nm", uo(q + offSize), seen + oh)
                q += 2L * offSize + 24
                j += 1
              }
            }
            i += 1
          }
        }
        walkBt(btree)
      }
    }
    walk("", rootOH, Set.empty)

    def groups: Seq[String] = groupPaths.toSeq
    def paths: Seq[String] = objectAddrs.keys.toSeq
    def datasets: Seq[String] =
      objectAddrs.keys.filterNot(groupPaths.contains).filter(_.nonEmpty).toSeq

    // --- per-object parses
    private def parseDtype(at: Long): Dtype = {
      val cv = b(at.toInt) & 0xff
      val cls = cv & 0x0f
      val bits0 = b(at.toInt + 1) & 0xff
      val size = u(at + 4, 4).toInt
      cls match {
        case 0 => Dtype(0, size, (bits0 & 1) == 0, (bits0 & 8) != 0)
        case 1 => Dtype(1, size, (bits0 & 1) == 0, signed = true)
        case 3 => Dtype(3, size, littleEndian = true, signed = false)
        case 9 =>
          require((bits0 & 0x0f) == 1, "variable-length non-string types unsupported")
          Dtype(9, size, littleEndian = true, signed = false)
        case other => throw new IllegalArgumentException(
          s"HDF5 datatype class $other unsupported")
      }
    }

    private def parseDims(at: Long): Array[Long] = {
      val ver = b(at.toInt) & 0xff
      val rank = b(at.toInt + 1) & 0xff
      val start = if (ver == 1) at + 8 else at + 4
      Array.tabulate(rank)(i => ul(start + i.toLong * lenSize))
    }

    def datasetInfo(path: String): DatasetInfo = {
      val oh = objectAddrs.getOrElse(path,
        throw new IllegalArgumentException(s"no HDF5 object at '$path'"))
      val msgs = messages(oh)
      def one(t: Int): Msg = msgs.find(_.typ == t).getOrElse(
        throw new IllegalArgumentException(s"'$path' lacks message type $t (not a dataset?)"))
      val dims = parseDims(one(0x01).body)
      val dtype = parseDtype(one(0x03).body)
      val lay = one(0x08)
      val lver = b(lay.body.toInt) & 0xff
      require(lver == 3, s"HDF5 data layout v$lver unsupported (v3 only)")
      val lcls = b(lay.body.toInt + 1) & 0xff
      var dataAddr = -1L; var dataSize = -1L; var btree = -1L
      var chunkDims = Array.empty[Int]; var compact: Option[Array[Byte]] = None
      lcls match {
        case 0 =>
          val sz = u(lay.body + 2, 2).toInt
          compact = Some(java.util.Arrays.copyOfRange(b, lay.body.toInt + 4, lay.body.toInt + 4 + sz))
        case 1 =>
          dataAddr = uo(lay.body + 2); dataSize = ul(lay.body + 2 + offSize)
        case 2 =>
          val nd = b(lay.body.toInt + 2) & 0xff
          btree = uo(lay.body + 3)
          chunkDims = Array.tabulate(nd)(i => u(lay.body + 3 + offSize + 4L * i, 4).toInt)
        case other => throw new IllegalArgumentException(s"layout class $other unsupported")
      }
      val filters: Seq[(Int, Array[Int])] = msgs.find(_.typ == 0x0B).map { fm =>
        val ver = b(fm.body.toInt) & 0xff
        val n = b(fm.body.toInt + 1) & 0xff
        var p = fm.body + (if (ver == 1) 8 else 2)
        (0 until n).map { _ =>
          val id = u(p, 2).toInt
          val nameLen = if (ver == 1 || id >= 256) { val v = u(p + 2, 2).toInt; v } else 0
          val hdr = if (ver == 1 || id >= 256) 8 else 6
          val ncd = u(p + hdr - 2, 2).toInt
          p += hdr
          p += (if (ver == 1) (nameLen + 7) / 8 * 8 else nameLen)
          val cds = Array.tabulate(ncd)(i => u(p + 4L * i, 4).toInt)
          p += 4L * ncd
          if (ver == 1 && ncd % 2 == 1) p += 4
          (id, cds)
        }
      }.getOrElse(Seq.empty)
      val fill: Option[Array[Byte]] = msgs.find(_.typ == 0x05).flatMap { fv =>
        val ver = b(fv.body.toInt) & 0xff
        try {
          if (ver == 3) {
            val fl = b(fv.body.toInt + 1) & 0xff
            if ((fl & 0x20) != 0) {
              val sz = u(fv.body + 2, 4).toInt
              Some(java.util.Arrays.copyOfRange(b, fv.body.toInt + 6, fv.body.toInt + 6 + sz))
            } else None
          } else { // v1/v2: alloc time, write time, defined flag, [size, data]
            if ((b(fv.body.toInt + 2) & 0xff) == 1 && fv.size >= 7) {
              val sz = u(fv.body + 3, 4).toInt
              if (sz > 0) Some(java.util.Arrays.copyOfRange(b, fv.body.toInt + 7, fv.body.toInt + 7 + sz))
              else None
            } else None
          }
        } catch { case _: Exception => None }
      }
      DatasetInfo(path, dims, dtype, lcls, dataAddr, dataSize, chunkDims,
        btree, filters, fill, compact)
    }

    // --- filters
    private def inflateTo(src: Array[Byte], expected: Int): Array[Byte] = {
      val inf = new Inflater()
      inf.setInput(src)
      val out = new Array[Byte](expected)
      var off = 0
      while (off < expected && !inf.finished()) {
        val n = inf.inflate(out, off, expected - off)
        if (n == 0 && inf.needsInput())
          throw new IllegalArgumentException("truncated deflate stream in HDF5 chunk")
        off += n
      }
      inf.end()
      if (off < expected) throw new IllegalArgumentException(
        s"HDF5 chunk inflated to $off of $expected bytes")
      out
    }

    private def unshuffle(src: Array[Byte], elemSize: Int): Array[Byte] = {
      if (elemSize <= 1) return src
      val n = src.length / elemSize
      val out = new Array[Byte](src.length)
      var k = 0
      while (k < elemSize) {
        var i = 0
        while (i < n) { out(i * elemSize + k) = src(k * n + i); i += 1 }
        k += 1
      }
      // trailing bytes (length not divisible by elemSize) pass through
      var t = n * elemSize
      while (t < src.length) { out(t) = src(t); t += 1 }
      out
    }

    private def applyFilters(raw0: Array[Byte], info: DatasetInfo,
                             mask: Int, expected: Int): Array[Byte] = {
      // pipeline is in application order; decode runs it in reverse
      var raw = raw0
      info.filters.zipWithIndex.reverse.foreach { case ((id, cd), i) =>
        if ((mask & (1 << i)) == 0) id match {
          case 1 => raw = inflateTo(raw, expected)
          case 2 => raw = unshuffle(raw, if (cd.nonEmpty) cd(0) else info.dtype.size)
          case 3 =>
            val stored = u0(raw, raw.length - 4)
            val body = java.util.Arrays.copyOf(raw, raw.length - 4)
            val sum = fletcher32(body)
            require(stored == sum, f"HDF5 fletcher32 mismatch: $stored%08x vs $sum%08x")
            raw = body
          case other => throw new IllegalArgumentException(
            s"HDF5 filter id $other unsupported (deflate/shuffle/fletcher32)")
        }
      }
      raw
    }
    private def u0(a: Array[Byte], off: Int): Long =
      (a(off) & 0xffL) | (a(off + 1) & 0xffL) << 8 | (a(off + 2) & 0xffL) << 16 | (a(off + 3) & 0xffL) << 24

    /** Chunks run through the filter pipeline so far — spec
      * instrumentation proving sliced reads decode ≪ whole-file.
      */
    def chunksDecoded: Int = nChunksDecoded
    private var nChunksDecoded = 0

    /** Raw element bytes for the whole dataset, row-major, in the
      * FILE's element byte order.
      */
    def readRaw(path: String): Array[Byte] = readRaw(datasetInfo(path))

    def readRaw(info: DatasetInfo): Array[Byte] = {
      val esz = info.dtype.size
      val total = info.nElems * esz
      require(total <= Int.MaxValue - 8, s"dataset ${info.path} too large for one buffer")
      info.layoutClass match {
        case 0 => info.compact.get
        case 1 =>
          if (undef(info.dataAddr)) {
            val out = new Array[Byte](total.toInt)
            info.fill.foreach(f => fillBytes(out, f))
            out
          } else java.util.Arrays.copyOfRange(b, info.dataAddr.toInt, (info.dataAddr + total).toInt)
        case 2 =>
          val out = new Array[Byte](total.toInt)
          info.fill.foreach(f => fillBytes(out, f))
          if (!undef(info.btreeAddr)) readChunks(info, out)
          out
      }
    }

    private def fillBytes(out: Array[Byte], fill: Array[Byte]): Unit =
      if (fill.nonEmpty && fill.exists(_ != 0)) {
        var i = 0
        while (i < out.length) { out(i) = fill(i % fill.length); i += 1 }
      }

    private def readChunks(info: DatasetInfo, out: Array[Byte]): Unit = {
      val esz = info.dtype.size
      val rank = info.dims.length
      val cd = info.chunkDims // rank+1 entries, last = element size
      require(cd.length == rank + 1, s"chunk rank ${cd.length} vs dataspace rank $rank")
      val chunkElems = (0 until rank).map(cd(_).toLong).product
      val expected = (chunkElems * esz).toInt
      // row-major strides over the dataset
      val strides = new Array[Long](rank)
      var acc = 1L
      var i = rank - 1
      while (i >= 0) { strides(i) = acc; acc *= info.dims(i); i -= 1 }
      val keySize = 8 + 8L * (rank + 1)
      def walkBt(addr: Long): Unit = {
        require(b(addr.toInt) == 'T' && b(addr.toInt + 1) == 'R', s"bad chunk btree at $addr")
        val lvl = b(addr.toInt + 5) & 0xff
        val n = u(addr + 6, 2).toInt
        var p = addr + 8 + 2L * offSize
        var k = 0
        while (k < n) {
          val stored = u(p, 4).toInt
          val mask = u(p + 4, 4).toInt
          val offs = Array.tabulate(rank)(j => u(p + 8 + 8L * j, 8))
          val child = uo(p + keySize)
          if (lvl > 0) walkBt(child)
          else {
            nChunksDecoded += 1
            val raw = applyFilters(
              java.util.Arrays.copyOfRange(b, child.toInt, child.toInt + stored),
              info, mask, expected)
            // copy chunk rows (contiguous along the last dim), clipped
            // at the dataset edge (edge chunks are stored full-size)
            val lastLen = math.min(cd(rank - 1).toLong, info.dims(rank - 1) - offs(rank - 1))
            if (lastLen > 0) {
              val outerCount = (0 until rank - 1).map(cd(_).toLong).product
              val locals = new Array[Long](math.max(rank - 1, 0))
              var oc = 0L
              while (oc < outerCount) {
                var rem = oc
                var d = rank - 2
                while (d >= 0) { locals(d) = rem % cd(d); rem /= cd(d); d -= 1 }
                var inBounds = true; var target = 0L
                d = 0
                while (d < rank - 1 && inBounds) {
                  val g = offs(d) + locals(d)
                  if (g >= info.dims(d)) inBounds = false
                  else target += g * strides(d)
                  d += 1
                }
                if (inBounds) {
                  target += offs(rank - 1)
                  val srcOff = (oc * cd(rank - 1) * esz).toInt
                  System.arraycopy(raw, srcOff, out, (target * esz).toInt, (lastLen * esz).toInt)
                }
                oc += 1
              }
            }
          }
          p += keySize + offSize
          k += 1
        }
      }
      walkBt(info.btreeAddr)
    }

    def dims(path: String): Array[Long] = datasetInfo(path).dims

    /** Run-sliced read of a 1-D dataset: decode ONLY the chunks that
      * overlap the requested element runs — the byte-level mechanism
      * under the reference's `index_range` reads (qfit_data.py:84
      * `h5_f[field][i0:i1]`, ATL06_data.py:130, geo_index.py:494-572
      * get_data_for_geo_index), where a granule query touches the
      * few matched `[offset_start, offset_end]` slices, never the
      * whole file.  `runs` are INCLUSIVE `[start, end]` element
      * ranges, sorted ascending and disjoint; the result is their
      * concatenation in run order.  The chunk B-tree is pruned at
      * internal nodes by its keys, so both decompression AND node
      * walking are proportional to the matched runs, not the file.
      */
    def readRawRuns(info: DatasetInfo, runs: Seq[(Long, Long)]): Array[Byte] = {
      require(info.dims.length == 1,
        s"run-sliced read needs a 1-D dataset; '${info.path}' has rank ${info.dims.length}")
      val nRuns = runs.size
      val starts = new Array[Long](nRuns)
      val ends = new Array[Long](nRuns)
      val pref = new Array[Long](nRuns + 1)
      var i = 0
      runs.foreach { case (s, e) =>
        require(s >= 0 && e >= s && e < info.dims(0),
          s"run [$s,$e] out of bounds for '${info.path}' (n=${info.dims(0)})")
        require(i == 0 || s > ends(i - 1),
          s"runs must be sorted and disjoint at [$s,$e]")
        starts(i) = s; ends(i) = e; pref(i + 1) = pref(i) + (e - s + 1); i += 1
      }
      val esz = info.dtype.size
      val total = pref(nRuns) * esz
      require(total <= Int.MaxValue - 8, s"sliced read of ${info.path} too large for one buffer")
      val out = new Array[Byte](total.toInt)
      info.fill.foreach(f => fillBytes(out, f))
      // first run whose end reaches `cs`, by binary search on run ends
      def firstRunFrom(cs: Long): Int = {
        var lo = 0; var hi = nRuns
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (ends(mid) < cs) lo = mid + 1 else hi = mid
        }
        lo
      }
      info.layoutClass match {
        case 0 =>
          val src = info.compact.get
          var r = 0
          while (r < nRuns) {
            System.arraycopy(src, (starts(r) * esz).toInt, out, (pref(r) * esz).toInt,
              ((ends(r) - starts(r) + 1) * esz).toInt)
            r += 1
          }
        case 1 =>
          if (!undef(info.dataAddr)) {
            var r = 0
            while (r < nRuns) {
              System.arraycopy(b, (info.dataAddr + starts(r) * esz).toInt,
                out, (pref(r) * esz).toInt,
                ((ends(r) - starts(r) + 1) * esz).toInt)
              r += 1
            }
          }
        case 2 =>
          if (!undef(info.btreeAddr) && nRuns > 0) {
            val cd = info.chunkDims
            require(cd.length == 2, s"chunk rank ${cd.length} vs dataspace rank 1")
            val rows = cd(0).toLong
            val expected = (rows * esz).toInt
            val keySize = 8 + 8L * 2
            val runMin = starts(0); val runMax = ends(nRuns - 1)
            def walkBt(addr: Long): Unit = {
              require(b(addr.toInt) == 'T' && b(addr.toInt + 1) == 'R', s"bad chunk btree at $addr")
              val lvl = b(addr.toInt + 5) & 0xff
              val n = u(addr + 6, 2).toInt
              var p = addr + 8 + 2L * offSize
              var k = 0
              while (k < n) {
                val cs = u(p + 8, 8) // key: first-dim chunk offset
                val child = uo(p + keySize)
                if (lvl > 0) {
                  // subtree holds chunks with offsets in [cs, nextKey.cs)
                  val csNext =
                    if (k < n - 1) u(p + keySize + offSize + 8, 8) else Long.MaxValue
                  if (csNext > runMin && cs <= runMax) {
                    val r0 = firstRunFrom(cs)
                    if (r0 < nRuns && starts(r0) < csNext) walkBt(child)
                  }
                } else {
                  val ce = cs + rows - 1
                  val r0 = firstRunFrom(cs)
                  if (cs <= runMax && r0 < nRuns && starts(r0) <= ce) {
                    nChunksDecoded += 1
                    val stored = u(p, 4).toInt
                    val mask = u(p + 4, 4).toInt
                    val raw = applyFilters(
                      java.util.Arrays.copyOfRange(b, child.toInt, child.toInt + stored),
                      info, mask, expected)
                    var r = r0
                    while (r < nRuns && starts(r) <= ce) {
                      val lo = math.max(cs, starts(r))
                      val hi = math.min(ce, ends(r))
                      if (hi >= lo)
                        System.arraycopy(raw, ((lo - cs) * esz).toInt,
                          out, ((pref(r) + (lo - starts(r))) * esz).toInt,
                          ((hi - lo + 1) * esz).toInt)
                      r += 1
                    }
                  }
                }
                p += keySize + offSize
                k += 1
              }
            }
            walkBt(info.btreeAddr)
          }
      }
      out
    }

    def readDoublesRuns(path: String, runs: Seq[(Long, Long)]): Array[Double] = {
      val info = datasetInfo(path)
      toDoubles(readRawRuns(info, runs), info.dtype)
    }

    def readLongsRuns(path: String, runs: Seq[(Long, Long)]): Array[Long] = {
      val info = datasetInfo(path)
      toLongs(readRawRuns(info, runs), info.dtype)
    }

    def readDoubles(path: String): Array[Double] = {
      val info = datasetInfo(path)
      val raw = readRaw(info)
      toDoubles(raw, info.dtype)
    }

    def readLongs(path: String): Array[Long] = {
      val info = datasetInfo(path)
      val raw = readRaw(info)
      toLongs(raw, info.dtype)
    }

    private def toDoubles(raw: Array[Byte], dt: Dtype): Array[Double] = {
      val bb = ByteBuffer.wrap(raw).order(
        if (dt.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      val n = raw.length / dt.size
      val out = new Array[Double](n)
      var i = 0
      (dt.cls, dt.size) match {
        case (1, 8) => while (i < n) { out(i) = bb.getDouble(i * 8); i += 1 }
        case (1, 4) => while (i < n) { out(i) = bb.getFloat(i * 4).toDouble; i += 1 }
        case (0, _) =>
          val l = toLongs(raw, dt)
          while (i < n) { out(i) = l(i).toDouble; i += 1 }
        case other => throw new IllegalArgumentException(s"cannot read $other as doubles")
      }
      out
    }

    private def toLongs(raw: Array[Byte], dt: Dtype): Array[Long] = {
      require(dt.cls == 0 || dt.cls == 1, s"cannot read class ${dt.cls} as longs")
      if (dt.cls == 1) return toDoubles(raw, dt).map(_.toLong)
      val bb = ByteBuffer.wrap(raw).order(
        if (dt.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      val n = raw.length / dt.size
      val out = new Array[Long](n)
      var i = 0
      dt.size match {
        case 1 => while (i < n) { out(i) = if (dt.signed) raw(i).toLong else raw(i) & 0xffL; i += 1 }
        case 2 => while (i < n) { val v = bb.getShort(i * 2); out(i) = if (dt.signed) v.toLong else v & 0xffffL; i += 1 }
        case 4 => while (i < n) { val v = bb.getInt(i * 4); out(i) = if (dt.signed) v.toLong else v & 0xffffffffL; i += 1 }
        case 8 => while (i < n) { out(i) = bb.getLong(i * 8); i += 1 }
        case other => throw new IllegalArgumentException(s"fixed-point size $other unsupported")
      }
      out
    }

    // --- attributes
    def attrs(path: String): Map[String, AttrVal] = {
      val oh = objectAddrs.getOrElse(path,
        throw new IllegalArgumentException(s"no HDF5 object at '$path'"))
      messages(oh).filter(_.typ == 0x0C).flatMap { m => parseAttr(m) }.toMap
    }

    private def pad8(n: Int): Int = (n + 7) / 8 * 8

    private def parseAttr(m: Msg): Option[(String, AttrVal)] = {
      val ver = b(m.body.toInt) & 0xff
      if (ver < 1 || ver > 3) return None
      val nameSize = u(m.body + 2, 2).toInt
      val dtSize = u(m.body + 4, 2).toInt
      val dsSize = u(m.body + 6, 2).toInt
      var p = m.body + 8 + (if (ver == 3) 1 else 0)
      val name = {
        var e = p.toInt
        while (b(e) != 0) e += 1
        new String(b, p.toInt, e - p.toInt, "UTF-8")
      }
      val padded = ver == 1
      p += (if (padded) pad8(nameSize) else nameSize)
      if (ver == 2 && (b(m.body.toInt + 1) & 0x01) != 0) return None // shared dtype
      val dt = parseDtype(p)
      val dtAt = p
      p += (if (padded) pad8(dtSize) else dtSize)
      val n = {
        val rank = b(p.toInt + 1) & 0xff
        if (rank == 0) 1L else parseDims(p).product
      }
      p += (if (padded) pad8(dsSize) else dsSize)
      val v: AttrVal = dt.cls match {
        case 3 =>
          StrAttr(Array.tabulate(n.toInt) { i =>
            val at = (p + i.toLong * dt.size).toInt
            var e = at
            while (e < at + dt.size && b(e) != 0) e += 1
            new String(b, at, e - at, "UTF-8")
          })
        case 9 =>
          StrAttr(Array.tabulate(n.toInt) { i =>
            val at = p + i.toLong * dt.size
            val len = u(at, 4).toInt
            val coll = uo(at + 4)
            val idx = u(at + 4 + offSize, 4).toInt
            globalHeapString(coll, idx, len)
          })
        case _ =>
          val raw = java.util.Arrays.copyOfRange(b, p.toInt, (p + n * dt.size).toInt)
          NumAttr(toDoubles2(raw, dt), toLongs2(raw, dt))
      }
      Some(name -> v)
    }
    private def toDoubles2(raw: Array[Byte], dt: Dtype): Array[Double] =
      if (dt.cls == 1) toDoubles(raw, dt) else toLongs(raw, dt).map(_.toDouble)
    private def toLongs2(raw: Array[Byte], dt: Dtype): Array[Long] =
      if (dt.cls == 1) toDoubles(raw, dt).map(_.toLong) else toLongs(raw, dt)

    private def globalHeapString(coll: Long, idx: Int, len: Int): String = {
      require(b(coll.toInt) == 'G' && b(coll.toInt + 1) == 'C', s"bad global heap at $coll")
      val end = coll + ul(coll + 8)
      var p = coll + 8 + lenSize
      while (p < end) {
        val oid = u(p, 2).toInt
        val osz = ul(p + 8)
        if (oid == idx) return new String(b, (p + 8 + lenSize).toInt, len, "UTF-8")
        if (oid == 0) return ""
        p += 8 + lenSize + (osz + 7) / 8 * 8
      }
      ""
    }
  }

  /** HDF5's fletcher32, replicated bit-for-bit from libhdf5's
    * H5_checksum_fletcher32 (H5checksum.c): big-endian 16-bit words,
    * uint32 accumulators (wrap emulated with a 0xffffffff mask),
    * 360-word inner blocks with a one's-complement fold per block,
    * odd trailing byte high-aligned, double final fold.  The fold —
    * not `% 65535` — matters: a sum that is a nonzero multiple of
    * 65535 folds to 0xffff, never 0, so using `%` here would reject
    * ~2^-15 of genuine libhdf5-written fletcher chunks (and libhdf5
    * would symmetrically reject ours).
    */
  private[sources] def fletcher32(data: Array[Byte]): Long = {
    var sum1 = 0L; var sum2 = 0L
    var off = 0
    var len = data.length / 2
    while (len > 0) {
      var tlen = if (len > 360) 360 else len
      len -= tlen
      while (tlen > 0) {
        sum1 = (sum1 + (((data(off) & 0xffL) << 8) | (data(off + 1) & 0xffL))) & 0xffffffffL
        off += 2
        sum2 = (sum2 + sum1) & 0xffffffffL
        tlen -= 1
      }
      sum1 = (sum1 & 0xffff) + (sum1 >>> 16)
      sum2 = (sum2 & 0xffff) + (sum2 >>> 16)
    }
    if (data.length % 2 == 1) {
      sum1 = (sum1 + ((data(data.length - 1) & 0xffL) << 8)) & 0xffffffffL
      sum2 = (sum2 + sum1) & 0xffffffffL
      sum1 = (sum1 & 0xffff) + (sum1 >>> 16)
      sum2 = (sum2 & 0xffff) + (sum2 >>> 16)
    }
    sum1 = (sum1 & 0xffff) + (sum1 >>> 16)
    sum2 = (sum2 & 0xffff) + (sum2 >>> 16)
    ((sum2 << 16) | sum1) & 0xffffffffL
  }

  // ------------------------------------------------------------- writer

  /** Chunk row count that keeps an n-element 1-D dataset within the
    * writer's 64-chunk B-tree capacity (with a 512-row floor) — the
    * one sizing rule every granule writer must share.
    */
  def chunkRowsFor(n: Int): Int = math.max(512, (n + 63) / 64)

  /** Minimal classic-format writer (superblock v0, v1 object headers,
    * symbol-table groups).  Groups are unbounded — the group B-tree
    * grows levels as needed at libhdf5's default K values (leaf 4 =
    * 8 symbols per SNOD, internal 16 = 32 children per node); chunked
    * datasets hold ≤ 64 chunks (size chunks with [[chunkRowsFor]]).
    * A granule writer, not a warehouse; the lakehouse substrate stays
    * parquet (GeoParquet).  Node allocations are padded to the B-tree
    * capacities implied by the superblock's K values so strict
    * readers that size nodes from K never read past EOF.
    */
  final class Writer {
    private sealed trait Node
    private final case class Ds(data: Array[Byte], dims: Array[Long], dtype: Dtype,
                                chunkRows: Int, gzip: Int, shuffle: Boolean,
                                fletcher: Boolean) extends Node
    private final case class Grp() extends Node

    private val nodes = scala.collection.mutable.LinkedHashMap[String, Node]("" -> Grp())
    private val attrsByPath =
      scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.LinkedHashMap[String, AttrVal]]

    private def ensureParents(path: String): Unit = {
      val parts = path.split("/").filter(_.nonEmpty)
      var cur = ""
      parts.dropRight(1).foreach { p =>
        cur = s"$cur/$p"
        nodes.getOrElseUpdate(cur, Grp())
      }
    }

    def group(path: String): Writer = {
      val norm = "/" + path.split("/").filter(_.nonEmpty).mkString("/")
      ensureParents(norm + "/x")
      nodes.getOrElseUpdate(norm, Grp())
      this
    }

    private def put(path: String, data: Array[Byte], dims: Array[Long], dt: Dtype,
                    chunkRows: Int, gzip: Int, shuffle: Boolean, fletcher: Boolean): Writer = {
      val norm = "/" + path.split("/").filter(_.nonEmpty).mkString("/")
      ensureParents(norm)
      require(!nodes.contains(norm), s"duplicate HDF5 path $norm")
      nodes(norm) = Ds(data, dims, dt, chunkRows, gzip, shuffle, fletcher)
      this
    }

    def doubles(path: String, v: Array[Double], dims: Seq[Long] = Seq.empty,
                chunkRows: Int = 0, gzip: Int = 0, shuffle: Boolean = false,
                fletcher: Boolean = false): Writer = {
      val bb = ByteBuffer.allocate(v.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      v.foreach(bb.putDouble)
      put(path, bb.array(), if (dims.nonEmpty) dims.toArray else Array(v.length.toLong),
        Dtype(1, 8, littleEndian = true, signed = true), chunkRows, gzip, shuffle, fletcher)
    }

    def longs(path: String, v: Array[Long], dims: Seq[Long] = Seq.empty,
              chunkRows: Int = 0, gzip: Int = 0, shuffle: Boolean = false,
              fletcher: Boolean = false): Writer = {
      val bb = ByteBuffer.allocate(v.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      v.foreach(bb.putLong)
      put(path, bb.array(), if (dims.nonEmpty) dims.toArray else Array(v.length.toLong),
        Dtype(0, 8, littleEndian = true, signed = true), chunkRows, gzip, shuffle, fletcher)
    }

    def ints(path: String, v: Array[Int], dims: Seq[Long] = Seq.empty,
             chunkRows: Int = 0, gzip: Int = 0, shuffle: Boolean = false,
             fletcher: Boolean = false): Writer = {
      val bb = ByteBuffer.allocate(v.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      v.foreach(bb.putInt)
      put(path, bb.array(), if (dims.nonEmpty) dims.toArray else Array(v.length.toLong),
        Dtype(0, 4, littleEndian = true, signed = true), chunkRows, gzip, shuffle, fletcher)
    }

    def bytesDs(path: String, v: Array[Byte], dims: Seq[Long] = Seq.empty,
                chunkRows: Int = 0, gzip: Int = 0): Writer =
      put(path, v, if (dims.nonEmpty) dims.toArray else Array(v.length.toLong),
        Dtype(0, 1, littleEndian = true, signed = false), chunkRows, gzip,
        shuffle = false, fletcher = false)

    def attr(path: String, name: String, v: AttrVal): Writer = {
      val norm = if (path.isEmpty || path == "/") ""
        else "/" + path.split("/").filter(_.nonEmpty).mkString("/")
      attrsByPath.getOrElseUpdate(norm,
        scala.collection.mutable.LinkedHashMap.empty[String, AttrVal])(name) = v
      this
    }
    def attrD(path: String, name: String, v: Double): Writer =
      attr(path, name, NumAttr(Array(v), Array(v.toLong)))
    def attrL(path: String, name: String, v: Long): Writer =
      attr(path, name, NumAttr(Array(v.toDouble), Array(v)))
    def attrS(path: String, name: String, v: String): Writer =
      attr(path, name, StrAttr(Array(v)))

    // B-tree capacities (must agree with the superblock K fields)
    // libhdf5's defaults (H5Pset_sym_k): leaf K=4 → 8 symbols per
    // SNOD, internal K=16 → 32 children per node.  SNODs allocate at
    // full 2K capacity, so a large leaf K makes every SMALL group pay
    // kilobytes of padding — a many-bin index file (one 3-dataset
    // subgroup per bin) bloats 16×.  Large groups instead grow the
    // multi-level B-tree, exactly as libhdf5 does.
    private val LeafK = 4       // 8 symbols per SNOD
    private val InternalK = 16  // 32 children per group btree node
    private val IstoreCap = 64  // chunk-btree capacity at libhdf5's default K=32

    def toBytes: Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream(1 << 20)
      val zeroBlock = new Array[Byte](8192)
      // capacity padding in bulk: per-byte write(0) loops made the
      // encode of a many-group file write-bound on padding alone
      def padUpTo(target: Long): Unit = {
        var n = (target - buf.size).toInt
        while (n > 0) { val k = math.min(n, zeroBlock.length); buf.write(zeroBlock, 0, k); n -= k }
      }
      def align8(): Unit = padUpTo((buf.size + 7L) / 8 * 8)
      def wU(v: Long, n: Int): Unit = { var k = 0; while (k < n) { buf.write(((v >> (8 * k)) & 0xff).toInt); k += 1 } }

      buf.write(new Array[Byte](96)) // superblock placeholder
      val addrOf = scala.collection.mutable.HashMap.empty[String, Long]

      // children indexed once up front: a per-group scan of ALL nodes
      // would make encoding quadratic in the node count, which a
      // many-bin index file (one subgroup per bin) turns into hours
      val childIndex: Map[String, Seq[String]] = nodes.keys
        .filter(_.nonEmpty)
        .toSeq
        .groupBy(k => k.substring(0, k.lastIndexOf('/')))
        .map { case (parent, ks) => parent -> ks.sorted }
      def childrenOf(path: String): Seq[String] =
        childIndex.getOrElse(path, Seq.empty)

      def dtypeMsg(dt: Dtype): Array[Byte] = {
        val bb = ByteBuffer.allocate(if (dt.cls == 1) 8 + 12 else 8 + 4).order(ByteOrder.LITTLE_ENDIAN)
        dt.cls match {
          case 1 =>
            bb.put((0x10 | 1).toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(dt.size)
            if (dt.size == 8) {
              bb.putShort(0).putShort(64).put(52.toByte).put(11.toByte)
                .put(0.toByte).put(52.toByte).putInt(1023)
            } else {
              bb.putShort(0).putShort(32).put(23.toByte).put(8.toByte)
                .put(0.toByte).put(23.toByte).putInt(127)
            }
          case 0 =>
            bb.put((0x10 | 0).toByte).put((if (dt.signed) 0x08 else 0x00).toByte)
              .put(0.toByte).put(0.toByte).putInt(dt.size)
            bb.putShort(0).putShort((8 * dt.size).toShort)
          case 3 =>
            bb.put((0x10 | 3).toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(dt.size)
            return java.util.Arrays.copyOf(bb.array(), 8)
          case other => throw new IllegalArgumentException(s"writer dtype class $other")
        }
        bb.array()
      }

      def dspaceMsg(dims: Array[Long]): Array[Byte] = {
        val bb = ByteBuffer.allocate(8 + 8 * dims.length).order(ByteOrder.LITTLE_ENDIAN)
        bb.put(1.toByte).put(dims.length.toByte).put(0.toByte)
        bb.position(8)
        dims.foreach(bb.putLong)
        bb.array()
      }

      def attrMsg(name: String, v: AttrVal): Array[Byte] = {
        def p8(n: Int) = (n + 7) / 8 * 8
        val (dt, data, n): (Array[Byte], Array[Byte], Int) = v match {
          case NumAttr(ds, ls) =>
            // longs win when they round-trip exactly; else float64
            val exact = ds.zip(ls).forall { case (d, l) => d == l.toDouble }
            if (exact && ds.nonEmpty && ds.forall(d => d == math.rint(d))) {
              val bb = ByteBuffer.allocate(ls.length * 8).order(ByteOrder.LITTLE_ENDIAN)
              ls.foreach(bb.putLong)
              (dtypeMsg(Dtype(0, 8, littleEndian = true, signed = true)), bb.array(), ls.length)
            } else {
              val bb = ByteBuffer.allocate(ds.length * 8).order(ByteOrder.LITTLE_ENDIAN)
              ds.foreach(bb.putDouble)
              (dtypeMsg(Dtype(1, 8, littleEndian = true, signed = true)), bb.array(), ds.length)
            }
          case StrAttr(ss) =>
            val w = math.max(1, ss.map(_.getBytes("UTF-8").length).max + 1)
            val out = new Array[Byte](w * ss.length)
            ss.zipWithIndex.foreach { case (s, i) =>
              val sb = s.getBytes("UTF-8"); System.arraycopy(sb, 0, out, i * w, sb.length)
            }
            (dtypeMsg(Dtype(3, w, littleEndian = true, signed = false)), out, ss.length)
        }
        val ds = if (n == 1) {
          // scalar dataspace
          val bb = ByteBuffer.allocate(8); bb.put(1.toByte).put(0.toByte); bb.array()
        } else dspaceMsg(Array(n.toLong))
        val nm = name.getBytes("UTF-8") :+ 0.toByte
        val bb = ByteBuffer.allocate(8 + p8(nm.length) + p8(dt.length) + p8(ds.length) + data.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        bb.put(1.toByte).put(0.toByte).putShort(nm.length.toShort)
          .putShort(dt.length.toShort).putShort(ds.length.toShort)
        bb.put(nm); bb.position(8 + p8(nm.length))
        bb.put(dt); bb.position(8 + p8(nm.length) + p8(dt.length))
        bb.put(ds); bb.position(8 + p8(nm.length) + p8(dt.length) + p8(ds.length))
        bb.put(data)
        bb.array()
      }

      // write one v1 object header from (type, body) pairs
      def writeOH(msgs: Seq[(Int, Array[Byte])]): Long = {
        align8()
        val at = buf.size.toLong
        val bodies = msgs.map { case (t, m) => (t, m, (m.length + 7) / 8 * 8) }
        val total = bodies.map(_._3 + 8).sum
        wU(1, 1); wU(0, 1); wU(msgs.length, 2); wU(1, 4); wU(total, 4); wU(0, 4)
        bodies.foreach { case (t, m, padded) =>
          wU(t, 2); wU(padded, 2); wU(0, 1); wU(0, 1); wU(0, 1); wU(0, 1)
          buf.write(m); var k = m.length; while (k < padded) { buf.write(0); k += 1 }
        }
        at
      }

      def deflateBytes(src: Array[Byte], level: Int): Array[Byte] = {
        val d = new Deflater(level)
        d.setInput(src); d.finish()
        val out = new java.io.ByteArrayOutputStream(src.length / 2 + 64)
        val tmp = new Array[Byte](8192)
        while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
        d.end(); out.toByteArray
      }

      def shuffleBytes(src: Array[Byte], esz: Int): Array[Byte] = {
        val n = src.length / esz
        val out = new Array[Byte](src.length)
        var k = 0
        while (k < esz) {
          var i = 0
          while (i < n) { out(k * n + i) = src(i * esz + k); i += 1 }
          k += 1
        }
        out
      }

      def writeDataset(path: String, d: Ds): Long = {
        val filters = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Int])]
        if (d.shuffle) filters += ((2, Array(d.dtype.size)))
        if (d.gzip > 0) filters += ((1, Array(d.gzip)))
        if (d.fletcher) filters += ((3, Array.empty[Int]))
        val msgs = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
        msgs += ((0x01, dspaceMsg(d.dims)))
        msgs += ((0x03, dtypeMsg(d.dtype)))
        if (d.chunkRows <= 0) {
          require(filters.isEmpty, s"filters require a chunked layout at $path")
          align8()
          val dataAddr = buf.size.toLong
          buf.write(d.data)
          val bb = ByteBuffer.allocate(2 + 16).order(ByteOrder.LITTLE_ENDIAN)
          bb.put(3.toByte).put(1.toByte).putLong(dataAddr).putLong(d.data.length.toLong)
          msgs += ((0x08, bb.array()))
        } else {
          require(d.dims.length == 1, "writer chunks 1-D datasets only")
          val esz = d.dtype.size
          val n = d.dims(0)
          val chunks = ((n + d.chunkRows - 1) / d.chunkRows).toInt
          require(chunks <= IstoreCap, s"$chunks chunks > $IstoreCap at $path (raise chunkRows)")
          val addrsAndSizes = (0 until chunks).map { ci =>
            val lo = ci.toLong * d.chunkRows
            val take = math.min(d.chunkRows.toLong, n - lo).toInt
            val raw = new Array[Byte](d.chunkRows * esz) // edge chunk zero-padded to full size
            System.arraycopy(d.data, (lo * esz).toInt, raw, 0, take * esz)
            var enc = raw
            filters.foreach {
              case (2, cd) => enc = shuffleBytes(enc, cd(0))
              case (1, cd) => enc = deflateBytes(enc, cd(0))
              case (3, _) =>
                val sum = fletcher32(enc)
                val e2 = java.util.Arrays.copyOf(enc, enc.length + 4)
                var k = 0
                while (k < 4) { e2(enc.length + k) = ((sum >> (8 * k)) & 0xff).toByte; k += 1 }
                enc = e2
              case _ => ()
            }
            align8()
            val a = buf.size.toLong
            buf.write(enc)
            (a, enc.length, ci.toLong * d.chunkRows)
          }
          // chunk B-tree: one level-0 node, padded to libhdf5's default
          // istore capacity so K-sized reads stay in bounds
          align8()
          val btAddr = buf.size.toLong
          val keySize = 8 + 8 * 2 // rank 1: chunkSize+mask, offset + elem-offset
          buf.write('T'); buf.write('R'); buf.write('E'); buf.write('E')
          wU(1, 1); wU(0, 1); wU(chunks, 2)
          wU(-1L, 8); wU(-1L, 8)
          addrsAndSizes.foreach { case (a, sz, off) =>
            wU(sz, 4); wU(0, 4); wU(off, 8); wU(0, 8)
            wU(a, 8)
          }
          wU(0, 4); wU(0, 4); wU(n, 8); wU(0, 8) // final key
          val cap = 24 + (IstoreCap + 1) * keySize + IstoreCap * 8
          var padTo = btAddr + cap
          padUpTo(padTo)
          val bb = ByteBuffer.allocate(3 + 8 + 8).order(ByteOrder.LITTLE_ENDIAN)
          bb.put(3.toByte).put(2.toByte).put(2.toByte).putLong(btAddr)
            .putInt(d.chunkRows).putInt(esz)
          msgs += ((0x08, java.util.Arrays.copyOf(bb.array(), 3 + 8 + 8)))
          if (filters.nonEmpty) {
            val fb = new java.io.ByteArrayOutputStream()
            fb.write(1); fb.write(filters.length)
            fb.write(new Array[Byte](6))
            filters.foreach { case (id, cds) =>
              fb.write(id & 0xff); fb.write(id >> 8)
              fb.write(0); fb.write(0) // name len 0
              fb.write(0); fb.write(0) // flags
              fb.write(cds.length & 0xff); fb.write(cds.length >> 8)
              cds.foreach { c => var k = 0; while (k < 4) { fb.write((c >> (8 * k)) & 0xff); k += 1 } }
              if (cds.length % 2 == 1) fb.write(new Array[Byte](4))
            }
            msgs += ((0x0B, fb.toByteArray))
          }
        }
        attrsByPath.get(path).foreach(_.foreach { case (nm, v) => msgs += ((0x0C, attrMsg(nm, v))) })
        writeOH(msgs.toSeq)
      }

      def writeGroup(path: String): Long = {
        val kids = childrenOf(path)
        val kidAddrs = kids.map { k =>
          val a = nodes(k) match {
            case d: Ds => writeDataset(k, d)
            case Grp() => writeGroup(k)
          }
          addrOf(k) = a
          a
        }
        // local heap: "" at 0, then names 8-aligned
        val names = kids.map(_.split("/").last)
        val heapData = new java.io.ByteArrayOutputStream()
        heapData.write(0)
        val nameOffs = names.map { nm =>
          while (heapData.size % 8 != 0) heapData.write(0)
          val off = heapData.size.toLong
          heapData.write(nm.getBytes("UTF-8")); heapData.write(0)
          off
        }
        while (heapData.size % 8 != 0) heapData.write(0)
        align8()
        val heapDataAddr = buf.size.toLong + 32
        val heapAddr = buf.size.toLong
        buf.write('H'); buf.write('E'); buf.write('A'); buf.write('P')
        wU(0, 1); wU(0, 1); wU(0, 1); wU(0, 1)
        wU(heapData.size.toLong, 8); wU(1, 8); wU(heapDataAddr, 8)
        buf.write(heapData.toByteArray)
        // SNODs of ≤ 2*LeafK symbols
        val groupsOfSyms = kids.zip(kidAddrs).zip(nameOffs).grouped(2 * LeafK).toSeq
        val snodAddrs = groupsOfSyms.map { syms =>
          align8()
          val a = buf.size.toLong
          buf.write('S'); buf.write('N'); buf.write('O'); buf.write('D')
          wU(1, 1); wU(0, 1); wU(syms.size, 2)
          syms.foreach { case ((_, kaddr), noff) =>
            wU(noff, 8); wU(kaddr, 8); wU(0, 4); wU(0, 4); buf.write(new Array[Byte](16))
          }
          val cap = 8 + 2 * LeafK * 40
          val padTo = a + cap
          padUpTo(padTo)
          a
        }
        // group B-tree over the SNODs, multi-level when one node's 2K
        // fan-out can't hold them all (reference-shaped index files
        // carry one subgroup per bin — groups grow with the index,
        // so capacity must not be a constant).  Levels build
        // bottom-up; nodes at each level are written consecutively so
        // sibling pointers are known up front.
        val nodeCap = 24 + (2 * InternalK + 1) * 8 + 2 * InternalK * 8
        var level = 0
        // (child address, key = heap offset of the subtree's last name)
        var entries: Seq[(Long, Long)] =
          snodAddrs.zip(groupsOfSyms).map { case (sa, syms) => (sa, syms.last._2) }
        var btAddr = -1L
        while (btAddr < 0) {
          // a childless group still gets one 0-entry level-0 node
          // (grouped() of an empty seq yields NO groups — without the
          // fallback this loop would never terminate)
          val grps0 = entries.grouped(2 * InternalK).toSeq
          val grps = if (grps0.isEmpty) Seq(Seq.empty[(Long, Long)]) else grps0
          align8()
          val base = buf.size.toLong
          val nodeAddrs = grps.indices.map(i => base + i.toLong * nodeCap)
          grps.zipWithIndex.foreach { case (g, i) =>
            buf.write('T'); buf.write('R'); buf.write('E'); buf.write('E')
            wU(0, 1); wU(level, 1); wU(g.size, 2)
            wU(if (i == 0) -1L else nodeAddrs(i - 1), 8)
            wU(if (i == grps.size - 1) -1L else nodeAddrs(i + 1), 8)
            // key0: "" for the leftmost node; later nodes inherit the
            // previous node's last key as their lower bound
            wU(if (i == 0) 0L else grps(i - 1).last._2, 8)
            g.foreach { case (child, key) => wU(child, 8); wU(key, 8) }
            val padTo = nodeAddrs(i) + nodeCap
            padUpTo(padTo)
          }
          if (grps.size == 1) btAddr = nodeAddrs(0)
          else {
            entries = nodeAddrs.zip(grps).map { case (a, g) => (a, g.last._2) }
            level += 1
          }
        }
        // symbol table message + attrs
        val stm = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
          .putLong(btAddr).putLong(heapAddr).array()
        val msgs = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]((0x11, stm))
        attrsByPath.get(path).foreach(_.foreach { case (nm, v) => msgs += ((0x0C, attrMsg(nm, v))) })
        writeOH(msgs.toSeq)
      }

      val rootAddr = writeGroup("")
      val out = buf.toByteArray
      val sb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
      sb.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
      sb.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte) // sb v0, fs v0, root v0, res
      sb.put(0.toByte).put(8.toByte).put(8.toByte).put(0.toByte) // shdr v0, off 8, len 8, res
      sb.putShort(LeafK.toShort).putShort(InternalK.toShort).putInt(0)
      sb.putLong(0L)            // base address
      sb.putLong(-1L)           // free-space info
      sb.putLong(out.length.toLong) // end of file
      sb.putLong(-1L)           // driver info
      sb.putLong(0L)            // root STE: link name offset 0
      sb.putLong(rootAddr)      // root object header
      sb.putInt(0).putInt(0)    // cache type 0 (+ reserved)
      // scratch already zero
      out
    }
  }
}
