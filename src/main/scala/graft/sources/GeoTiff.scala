package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Real GeoTIFF file IO — the byte-level half of the reference's
  * `mapData.from_geotif` / `to_geotif` (mapData.py:39-94, 125-158),
  * which the reference delegates to GDAL.  No GDAL exists in a Spark
  * executor, so this is a self-contained classic-TIFF 6.0 + GeoTIFF
  * codec for the DEM subset the reference actually uses:
  *
  *   - reader: little- or big-endian classic TIFF; striped or tiled;
  *     Compression None(1)/LZW(5)/Deflate(8, 32946); horizontal
  *     predictor(2); samples u8/i8/u16/i16/u32/i32/f32/f64, chunky
  *     planar config, any band count; georeferencing from
  *     ModelPixelScale(33550) + ModelTiepoint(33922), CRS from
  *     GeoKeyDirectory(34735), nodata from GDAL_NODATA(42113).
  *   - writer: little- or big-endian; float64 (lossless for our grid
  *     tables) / float32, or u8/u16/u32 integer samples with optional
  *     horizontal predictor(2); None/LZW/Deflate; striped or
  *     16×-tiled; NaN nodata for floats — the same header layout
  *     `gdal.GetDriverByName('GTiff')` emits for `to_geotif`
  *     (mapData.py:138: LZW default).
  *
  * Scale shape: one `.tif` is one raster TILE (bounded — the same
  * E*_N* tiling RasterSink uses), so encode/decode run entirely on
  * executors: writes via [[writeTiles]]'s `mapPartitions`, reads via
  * the `binaryFile` source + `flatMap` ([[read]]) — a 10⁶-granule
  * archive decodes embarrassingly parallel, one file per task unit,
  * nothing raster-sized ever on the driver.
  */
object GeoTiff {

  /** Georeferencing: `originX/originY` is the OUTER corner of pixel
    * (0,0) (GDAL's GT[0]/GT[3]); pixel centers are
    * `x(c) = originX + (c+0.5)·sx`, `y(r) = originY − (r+0.5)·sy`
    * (mapData.py:56-59).
    */
  final case class Georef(epsg: Int, sx: Double, sy: Double,
                          originX: Double, originY: Double)

  /** A decoded raster: `samples(band)(r*nx+c)`, row 0 = max y. */
  final case class Decoded(nx: Int, ny: Int, bands: Int, ref: Georef,
                           nodata: Option[Double],
                           samples: Array[Array[Double]]) {
    def xCenter(c: Int): Double = ref.originX + (c + 0.5) * ref.sx
    def yCenter(r: Int): Double = ref.originY - (r + 0.5) * ref.sy
  }

  // ---------------------------------------------------------------- write

  private val TagWidth = 256
  private val TagLength = 257
  private val TagBits = 258
  private val TagCompression = 259
  private val TagPhotometric = 262
  private val TagStripOffsets = 273
  private val TagSamplesPerPixel = 277
  private val TagRowsPerStrip = 278
  private val TagStripByteCounts = 279
  private val TagPlanarConfig = 284
  private val TagPredictor = 317
  private val TagTileWidth = 322
  private val TagTileLength = 323
  private val TagTileOffsets = 324
  private val TagTileByteCounts = 325
  private val TagSampleFormat = 339
  private val TagModelPixelScale = 33550
  private val TagModelTiepoint = 33922
  private val TagGeoKeyDirectory = 34735
  private val TagGdalNodata = 42113

  private val TShort = 3
  private val TLong = 4
  private val TDouble = 12
  private val TAscii = 2

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  private def inflate(b: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(b)
    val out = new Array[Byte](expected)
    var off = 0
    while (off < expected && !inf.finished()) {
      val n = inf.inflate(out, off, expected - off)
      if (n == 0 && inf.needsInput())
        throw new IllegalArgumentException("truncated deflate stream in TIFF strip")
      off += n
    }
    inf.end()
    if (off < expected) throw new IllegalArgumentException(
      s"deflate stream ended at $off of $expected bytes in TIFF strip")
    out
  }

  /** Undo horizontal differencing (predictor 2) in place for one row:
    * sample values accumulate left-to-right per band, modulo the
    * sample width.  Multi-byte samples are assembled in the FILE's
    * byte order — carry propagation differs under byte-swap, so using
    * the wrong order decodes big-endian 16/32-bit data silently wrong.
    */
  private def undiffRow(row: Array[Byte], off: Int, cols: Int, nb: Int,
                        bytesPer: Int, order: ByteOrder): Unit =
    predRow(row, off, cols, nb, bytesPer, order, add = true)

  /** Apply horizontal differencing (predictor 2) in place for one row
    * — the encoder-side inverse of [[undiffRow]]; runs right-to-left
    * so each sample diffs against the original left neighbor.
    */
  private def diffRow(row: Array[Byte], off: Int, cols: Int, nb: Int,
                      bytesPer: Int, order: ByteOrder): Unit =
    predRow(row, off, cols, nb, bytesPer, order, add = false)

  private def predRow(row: Array[Byte], off: Int, cols: Int, nb: Int,
                      bytesPer: Int, order: ByteOrder, add: Boolean): Unit = {
    val be = order == ByteOrder.BIG_ENDIAN
    @inline def shift(k: Int): Int = if (be) 8 * (bytesPer - 1 - k) else 8 * k
    @inline def get(at: Int): Long = {
      var v = 0L; var k = 0
      while (k < bytesPer) { v |= (row(at + k) & 0xffL) << shift(k); k += 1 }
      v
    }
    @inline def set(at: Int, v: Long): Unit = {
      var k = 0
      while (k < bytesPer) { row(at + k) = ((v >> shift(k)) & 0xff).toByte; k += 1 }
    }
    var c = if (add) 1 else cols - 1
    while (if (add) c < cols else c >= 1) {
      var b = 0
      while (b < nb) {
        val i = off + (c * nb + b) * bytesPer
        val p = off + ((c - 1) * nb + b) * bytesPer
        val v = get(i); val pv = get(p)
        set(i, if (add) v + pv else v - pv)
        b += 1
      }
      c += (if (add) 1 else -1)
    }
  }

  /** TIFF-variant LZW (TIFF 6.0 §13): MSB-first codes, ClearCode 256,
    * EOI 257.  The width/reset schedule mirrors the DECODER's table,
    * which runs one entry behind the encoder's: we widen only after
    * assigning entry 511/1023/2047 (the decoder widens after ITS
    * entry 510/1022/2046, so the first wider code we emit is exactly
    * the first one it reads wider) and emit ClearCode after assigning
    * entry 4094 — the schedule libtiff/GDAL and the JDK TIFF plugin
    * decode, proven by GeoTiffInteropSpec's reset-scale JDK decode.
    */
  private[graft] def lzwEncode(src: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(src.length / 2 + 64)
    var bitBuf = 0L; var bitCnt = 0
    var codeBits = 9
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << codeBits) | code; bitCnt += codeBits
      while (bitCnt >= 8) { out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8 }
    }
    val dict = new java.util.HashMap[String, Integer]()
    def reset(): Unit = { dict.clear(); codeBits = 9 }
    var nextCode = 258
    // advance the decoder-mirrored table state by one entry
    def grow(): Unit = {
      nextCode += 1
      if (nextCode == 4095) { put(256); reset(); nextCode = 258 }
      else if (nextCode == (1 << codeBits) && codeBits < 12) codeBits += 1
    }
    put(256); reset()
    var cur = new StringBuilder
    var i = 0
    while (i < src.length) {
      val ch = (src(i) & 0xff).toChar
      val ext = cur.toString + ch
      val hit = if (ext.length == 1) ext.charAt(0).toInt < 256 else dict.containsKey(ext)
      if (hit) cur = new StringBuilder(ext)
      else {
        val s = cur.toString
        put(if (s.length == 1) s.charAt(0).toInt else dict.get(s))
        dict.put(ext, nextCode)
        grow()
        cur = new StringBuilder(ch.toString)
      }
      i += 1
    }
    if (cur.nonEmpty) {
      val s = cur.toString
      put(if (s.length == 1) s.charAt(0).toInt else dict.get(s))
      // phantom grow (libtiff LZWPostEncode): the decoder adds one
      // more entry after reading this final code and may widen before
      // it reads EOI — keep EOI's width in lockstep
      grow()
    }
    put(257)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  /** Decode with the conformant TIFF 6.0 / libtiff / JDK width
    * schedule first (decoder widens after adding entry 510/1022/2046
    * — one entry behind the encoder's 511/1023/2047), falling back to
    * a one-entry-earlier schedule for streams from non-conformant
    * writers (graft ≤ r9's own encoder was one such).  A stream
    * decoded under the wrong schedule desyncs at the first width
    * boundary and either throws or yields the wrong byte count.
    */
  private[graft] def lzwDecode(src: Array[Byte], expected: Int): Array[Byte] = {
    def tryWith(off: Int): Array[Byte] = {
      val a = lzwDecodeProbe(src, expected, off)
      if (a.length != expected) throw new IllegalArgumentException(
        s"LZW decode length ${a.length} != expected $expected")
      a
    }
    try tryWith(0)
    catch { case _: IllegalArgumentException => tryWith(-1) }
  }

  private[graft] def lzwDecodeProbe(src: Array[Byte], expected: Int,
                                      bumpOffset: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(expected)
    var bitPos = 0
    def next(bits: Int): Int = {
      if ((bitPos + bits) > src.length * 8) return 257 // ran off the end → treat as EOI
      var v = 0; var n = bits
      while (n > 0) {
        val byteI = bitPos >> 3; val bitI = bitPos & 7
        val take = math.min(8 - bitI, n)
        val chunk = ((src(byteI) & 0xff) >> (8 - bitI - take)) & ((1 << take) - 1)
        v = (v << take) | chunk
        bitPos += take; n -= take
      }
      v
    }
    val dict = new Array[Array[Byte]](4096)
    var dictSize = 0; var codeBits = 9
    def reset(): Unit = {
      var j = 0
      while (j < 256) { dict(j) = Array(j.toByte); j += 1 }
      dictSize = 258; codeBits = 9
    }
    reset()
    var prev: Array[Byte] = null
    var done = false
    while (!done) {
      val code = next(codeBits)
      if (code == 257) done = true
      else if (code == 256) { reset(); prev = null }
      else {
        val entry: Array[Byte] =
          if (code < dictSize && dict(code) != null) dict(code)
          else if (code == dictSize && prev != null) prev :+ prev(0)
          else throw new IllegalArgumentException(s"corrupt LZW stream: code $code size $dictSize")
        out.write(entry)
        if (prev != null && dictSize < 4096) {
          dict(dictSize) = prev :+ entry(0); dictSize += 1
          // the decoder's table is one entry behind the encoder's, so
          // it widens after adding entry 510/1022/2046 (table size
          // 511/1023/2047) where the encoder widens after assigning
          // 511/1023/2047 (TIFF 6.0 §13 early change)
          if (dictSize == (1 << codeBits) - 1 + bumpOffset && codeBits < 12) codeBits += 1
        }
        prev = entry
      }
    }
    out.toByteArray
  }

  /** Encode a dense raster (`bandsData(b)(r*nx+c)`, row 0 = max y) as
    * a GeoTIFF.  `sampleFormat` 3 (IEEE float, `bits` 32/64 — the
    * lossless default for our grid tables) or 1/2 (unsigned/signed
    * int, `bits` 8/16/32, values rounded); `compression` "none" |
    * "deflate" | "lzw"; `predictor` 2 applies TIFF horizontal
    * differencing before compression (integer formats only — cuts
    * file size on smooth DEMs, and is what GDAL emits by default for
    * integer rasters); `bigEndian` writes an `MM` file; `tiled`
    * writes 16×16 tiles instead of strips (all combinations for
    * read-path parity coverage).
    */
  def encode(bandsData: Array[Array[Double]], nx: Int, ny: Int, ref: Georef,
             bits: Int = 64, compression: String = "deflate",
             rowsPerStrip: Int = 0, tiled: Boolean = false,
             sampleFormat: Int = 3, predictor: Int = 1,
             bigEndian: Boolean = false): Array[Byte] = {
    require(bandsData.nonEmpty && bandsData.forall(_.length == nx * ny),
      s"band data must be ${nx}x$ny dense")
    require(sampleFormat == 1 || sampleFormat == 2 || sampleFormat == 3,
      s"SampleFormat $sampleFormat unsupported (uint/int/float)")
    if (sampleFormat == 3)
      require(bits == 32 || bits == 64, "float samples are 32- or 64-bit")
    else
      require(bits == 8 || bits == 16 || bits == 32, "int samples are 8/16/32-bit")
    require(predictor == 1 || predictor == 2,
      s"predictor $predictor unsupported (none/horizontal)")
    require(!(predictor == 2 && sampleFormat == 3),
      "horizontal predictor over float samples is not meaningful")
    val nb = bandsData.length
    val bytesPer = bits / 8
    val order = if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
    val compCode = compression match {
      case "none" => 1; case "lzw" => 5; case "deflate" => 8
      case other => throw new IllegalArgumentException(s"unknown compression '$other'")
    }
    def pack(r0: Int, rows: Int, c0: Int, cols: Int): Array[Byte] = {
      val bb = ByteBuffer.allocate(rows * cols * nb * bytesPer).order(order)
      var r = r0
      while (r < r0 + rows) {
        var c = c0
        while (c < c0 + cols) {
          var b = 0
          while (b < nb) {
            // tiles pad past the image edge with zeros
            val v = if (r < ny && c < nx) bandsData(b)(r * nx + c) else 0.0
            (bits, sampleFormat) match {
              case (64, 3) => bb.putDouble(v)
              case (32, 3) => bb.putFloat(v.toFloat)
              case (8, _)  => bb.put((math.round(v) & 0xffL).toByte)
              case (16, _) => bb.putShort((math.round(v) & 0xffffL).toShort)
              case (32, _) => bb.putInt(math.round(v).toInt)
            }
            b += 1
          }
          c += 1
        }
        r += 1
      }
      val raw = bb.array()
      if (predictor == 2) {
        var rr = 0
        while (rr < rows) { diffRow(raw, rr * cols * nb * bytesPer, cols, nb, bytesPer, order); rr += 1 }
      }
      raw
    }
    def compress(raw: Array[Byte]): Array[Byte] = compCode match {
      case 1 => raw; case 5 => lzwEncode(raw); case 8 => deflate(raw)
    }

    // chunks: strips (full-width row bands) or 16x16-aligned tiles
    val tileW = 16; val tileH = 16
    val (chunks, rps, tilesAcross) =
      if (tiled) {
        val ta = (nx + tileW - 1) / tileW
        val td = (ny + tileH - 1) / tileH
        val cs = for (ty <- 0 until td; tx <- 0 until ta)
          yield compress(pack(ty * tileH, tileH, tx * tileW, tileW))
        (cs.toVector, 0, ta)
      } else {
        val r = if (rowsPerStrip > 0) rowsPerStrip
          else math.max(1, (8 << 20) / math.max(1, nx * nb * bytesPer))
        val cs = (0 until ny by r)
          .map(r0 => compress(pack(r0, math.min(r, ny - r0), 0, nx))).toVector
        (cs, r, 0)
      }

    // layout: header(8) | chunk data | out-of-line values | IFD
    val dataStart = 8
    val chunkOffsets = chunks.scanLeft(dataStart.toLong)(_ + _.length).init
    val afterData = chunkOffsets.last + chunks.last.length

    final case class Entry(tag: Int, typ: Int, count: Int, payload: Array[Byte])
    def shorts(vs: Int*): Array[Byte] = {
      val bb = ByteBuffer.allocate(vs.length * 2).order(order)
      vs.foreach(v => bb.putShort(v.toShort)); bb.array()
    }
    def longs(vs: Long*): Array[Byte] = {
      val bb = ByteBuffer.allocate(vs.length * 4).order(order)
      vs.foreach(v => bb.putInt(v.toInt)); bb.array()
    }
    def doubles(vs: Double*): Array[Byte] = {
      val bb = ByteBuffer.allocate(vs.length * 8).order(order)
      vs.foreach(bb.putDouble); bb.array()
    }
    val geoKeys = shorts(
      1, 1, 0, 3, // version, rev 1.0, 3 keys follow
      1024, 0, 1, 1, // GTModelTypeGeoKey = projected
      1025, 0, 1, 1, // GTRasterTypeGeoKey = PixelIsArea
      3072, 0, 1, ref.epsg) // ProjectedCSTypeGeoKey
    val nodataAscii = "nan\u0000".getBytes("US-ASCII")
    val entries = Vector(
      Entry(TagWidth, TLong, 1, longs(nx)),
      Entry(TagLength, TLong, 1, longs(ny)),
      Entry(TagBits, TShort, nb, shorts(Seq.fill(nb)(bits): _*)),
      Entry(TagCompression, TShort, 1, shorts(compCode)),
      Entry(TagPhotometric, TShort, 1, shorts(1))) ++
      (if (tiled) Vector(
        Entry(TagTileWidth, TShort, 1, shorts(tileW)),
        Entry(TagTileLength, TShort, 1, shorts(tileH)),
        Entry(TagTileOffsets, TLong, chunks.length, longs(chunkOffsets: _*)),
        Entry(TagTileByteCounts, TLong, chunks.length, longs(chunks.map(_.length.toLong): _*)))
      else Vector(
        Entry(TagStripOffsets, TLong, chunks.length, longs(chunkOffsets: _*)),
        Entry(TagRowsPerStrip, TLong, 1, longs(rps)),
        Entry(TagStripByteCounts, TLong, chunks.length, longs(chunks.map(_.length.toLong): _*)))) ++
      (if (predictor == 2) Vector(Entry(TagPredictor, TShort, 1, shorts(2)))
       else Vector.empty) ++
      Vector(
        Entry(TagSamplesPerPixel, TShort, 1, shorts(nb)),
        Entry(TagPlanarConfig, TShort, 1, shorts(1)),
        Entry(TagSampleFormat, TShort, nb, shorts(Seq.fill(nb)(sampleFormat): _*)),
        Entry(TagModelPixelScale, TDouble, 3, doubles(ref.sx, ref.sy, 0.0)),
        Entry(TagModelTiepoint, TDouble, 6,
          doubles(0.0, 0.0, 0.0, ref.originX, ref.originY, 0.0)),
        Entry(TagGeoKeyDirectory, TShort, 16, geoKeys)) ++
      // "nan" nodata only makes sense for float samples
      (if (sampleFormat == 3)
        Vector(Entry(TagGdalNodata, TAscii, nodataAscii.length, nodataAscii))
       else Vector.empty)
    val sorted = entries.sortBy(_.tag)

    // out-of-line payloads (>4 bytes) follow the chunk data
    var auxOff = afterData
    val aux = new java.io.ByteArrayOutputStream()
    val valueFields: Vector[Array[Byte]] = sorted.map { e =>
      if (e.payload.length <= 4) java.util.Arrays.copyOf(e.payload, 4)
      else {
        if (auxOff % 2 == 1) { aux.write(0); auxOff += 1 } // word-align
        val f = longs(auxOff); auxOff += e.payload.length; aux.write(e.payload); f
      }
    }
    val ifdOff = auxOff
    val out = new java.io.ByteArrayOutputStream(ifdOff.toInt + sorted.length * 12 + 32)
    val hdr = ByteBuffer.allocate(8).order(order)
    val bom = if (bigEndian) 'M'.toByte else 'I'.toByte
    hdr.put(bom).put(bom).putShort(42).putInt(ifdOff.toInt)
    out.write(hdr.array())
    chunks.foreach(out.write)
    out.write(aux.toByteArray)
    val ifd = ByteBuffer.allocate(2 + sorted.length * 12 + 4).order(order)
    ifd.putShort(sorted.length.toShort)
    sorted.zip(valueFields).foreach { case (e, vf) =>
      ifd.putShort(e.tag.toShort).putShort(e.typ.toShort).putInt(e.count).put(vf)
    }
    ifd.putInt(0)
    out.write(ifd.array())
    out.toByteArray
  }

  // ---------------------------------------------------------------- read

  private final case class Field(typ: Int, count: Int, raw: Array[Byte], order: ByteOrder) {
    private def buf = ByteBuffer.wrap(raw).order(order)
    def longs: Array[Long] = {
      val b = buf
      typ match {
        case 1 | 6 | 7 => raw.take(count).map(v => (v & 0xff).toLong)
        case 3 | 8     => Array.tabulate(count)(i => (b.getShort(i * 2) & 0xffff).toLong)
        case 4 | 9     => Array.tabulate(count)(i => b.getInt(i * 4) & 0xffffffffL)
        case other => throw new IllegalArgumentException(s"TIFF field type $other not integral")
      }
    }
    def doubles: Array[Double] = typ match {
      case 11 => val b = buf; Array.tabulate(count)(i => b.getFloat(i * 4).toDouble)
      case 12 => val b = buf; Array.tabulate(count)(i => b.getDouble(i * 8))
      case _  => longs.map(_.toDouble)
    }
    def ascii: String = new String(raw, 0, count, "US-ASCII").takeWhile(_ != '\u0000').trim
  }

  private def typeSize(t: Int): Int = t match {
    case 1 | 2 | 6 | 7 => 1; case 3 | 8 => 2; case 4 | 9 | 11 => 4
    case 5 | 10 | 12 => 8
    case other => throw new IllegalArgumentException(s"unknown TIFF field type $other")
  }

  def decode(bytes: Array[Byte]): Decoded = decodeWith(bytes, requireGeo = true)

  /** Decode a plain (not necessarily geo-referenced) TIFF — the
    * interop surface: files from other writers may lack the GeoTIFF
    * tags, in which case a unit georef (pixel centers at c+0.5 /
    * ny−r−0.5, epsg 0) is substituted.
    */
  def decodeRaster(bytes: Array[Byte]): Decoded = decodeWith(bytes, requireGeo = false)

  private def decodeWith(bytes: Array[Byte], requireGeo: Boolean): Decoded = {
    require(bytes.length > 8, "not a TIFF: too short")
    val order = (bytes(0), bytes(1)) match {
      case ('I', 'I') => ByteOrder.LITTLE_ENDIAN
      case ('M', 'M') => ByteOrder.BIG_ENDIAN
      case _ => throw new IllegalArgumentException("not a TIFF: bad byte-order mark")
    }
    val bb = ByteBuffer.wrap(bytes).order(order)
    val magic = bb.getShort(2) & 0xffff
    if (magic == 43) throw new IllegalArgumentException(
      "BigTIFF not supported (classic TIFF only — split the raster into tiles)")
    require(magic == 42, s"not a TIFF: magic $magic")
    val ifdOff = bb.getInt(4) & 0xffffffffL
    val nEntries = bb.getShort(ifdOff.toInt) & 0xffff
    val fields: Map[Int, Field] = (0 until nEntries).map { i =>
      val e = ifdOff.toInt + 2 + i * 12
      val tag = bb.getShort(e) & 0xffff
      val typ = bb.getShort(e + 2) & 0xffff
      val count = bb.getInt(e + 4)
      val size = typeSize(typ) * count
      val raw =
        if (size <= 4) java.util.Arrays.copyOfRange(bytes, e + 8, e + 12)
        else {
          val off = bb.getInt(e + 8)
          java.util.Arrays.copyOfRange(bytes, off, off + size)
        }
      tag -> Field(typ, count, raw, order)
    }.toMap

    def longOpt(tag: Int): Option[Long] = fields.get(tag).map(_.longs.head)
    def longReq(tag: Int, what: String): Long =
      longOpt(tag).getOrElse(throw new IllegalArgumentException(s"TIFF missing $what (tag $tag)"))

    val nx = longReq(TagWidth, "ImageWidth").toInt
    val ny = longReq(TagLength, "ImageLength").toInt
    val nb = longOpt(TagSamplesPerPixel).getOrElse(1L).toInt
    val bitsArr = fields.get(TagBits).map(_.longs).getOrElse(Array(1L))
    require(bitsArr.distinct.length == 1, "mixed per-band BitsPerSample not supported")
    val bits = bitsArr.head.toInt
    val fmt = fields.get(TagSampleFormat).map(_.longs.head).getOrElse(1L).toInt
    val comp = longOpt(TagCompression).getOrElse(1L).toInt
    val predictor = longOpt(TagPredictor).getOrElse(1L).toInt
    val planar = longOpt(TagPlanarConfig).getOrElse(1L).toInt
    require(planar == 1 || nb == 1,
      s"PlanarConfiguration=$planar unsupported (chunky only)")
    require(predictor == 1 || predictor == 2,
      s"TIFF predictor $predictor unsupported (none/horizontal only)")
    require(!(predictor == 2 && fmt == 3),
      "horizontal predictor over float samples is not meaningful")
    val bytesPer = bits / 8
    require(Set(8, 16, 32, 64)(bits), s"BitsPerSample $bits unsupported")

    def decompress(chunk: Array[Byte], expected: Int): Array[Byte] = comp match {
      case 1 => chunk
      case 5 => lzwDecode(chunk, expected)
      case 8 | 32946 => inflate(chunk, expected)
      case other => throw new IllegalArgumentException(
        s"TIFF compression $other unsupported (none/LZW/deflate)")
    }
    def undiff(row: Array[Byte], cols: Int): Unit =
      if (predictor == 2)
        undiffRow(row, 0, cols, nb, bytesPer, order)
    def sampleAt(buf: ByteBuffer, idx: Int): Double = (bits, fmt) match {
      case (8, 1)  => (buf.get(idx) & 0xff).toDouble
      case (8, 2)  => buf.get(idx).toDouble
      case (16, 1) => (buf.getShort(idx * 2) & 0xffff).toDouble
      case (16, 2) => buf.getShort(idx * 2).toDouble
      case (32, 1) => (buf.getInt(idx * 4) & 0xffffffffL).toDouble
      case (32, 2) => buf.getInt(idx * 4).toDouble
      case (32, 3) => buf.getFloat(idx * 4).toDouble
      case (64, 3) => buf.getDouble(idx * 8)
      case other => throw new IllegalArgumentException(
        s"sample (bits, format) $other unsupported")
    }

    val samples = Array.fill(nb)(new Array[Double](nx * ny))
    if (fields.contains(TagTileOffsets)) {
      val tw = longReq(TagTileWidth, "TileWidth").toInt
      val tl = longReq(TagTileLength, "TileLength").toInt
      val offs = fields(TagTileOffsets).longs
      val cnts = fields(TagTileByteCounts).longs
      val tilesAcross = (nx + tw - 1) / tw
      offs.indices.foreach { t =>
        val raw = decompress(
          java.util.Arrays.copyOfRange(bytes, offs(t).toInt, (offs(t) + cnts(t)).toInt),
          tw * tl * nb * bytesPer)
        val tx = t % tilesAcross; val ty = t / tilesAcross
        var tr = 0
        while (tr < tl) {
          val r = ty * tl + tr
          if (r < ny) {
            val row = java.util.Arrays.copyOfRange(
              raw, tr * tw * nb * bytesPer, (tr + 1) * tw * nb * bytesPer)
            undiff(row, tw)
            val rb = ByteBuffer.wrap(row).order(order)
            var tc = 0
            while (tc < tw) {
              val c = tx * tw + tc
              if (c < nx) {
                var b = 0
                while (b < nb) {
                  samples(b)(r * nx + c) = sampleAt(rb, tc * nb + b); b += 1
                }
              }
              tc += 1
            }
          }
          tr += 1
        }
      }
    } else {
      val offs = fields.getOrElse(TagStripOffsets,
        throw new IllegalArgumentException("TIFF missing StripOffsets")).longs
      val cnts = fields(TagStripByteCounts).longs
      val rps = longOpt(TagRowsPerStrip).getOrElse(ny.toLong).toInt
      offs.indices.foreach { s =>
        val r0 = s * rps
        val rows = math.min(rps, ny - r0)
        val raw = decompress(
          java.util.Arrays.copyOfRange(bytes, offs(s).toInt, (offs(s) + cnts(s)).toInt),
          rows * nx * nb * bytesPer)
        var rr = 0
        while (rr < rows) {
          val row = java.util.Arrays.copyOfRange(
            raw, rr * nx * nb * bytesPer, (rr + 1) * nx * nb * bytesPer)
          undiff(row, nx)
          val rb = ByteBuffer.wrap(row).order(order)
          val r = r0 + rr
          var c = 0
          while (c < nx) {
            var b = 0
            while (b < nb) { samples(b)(r * nx + c) = sampleAt(rb, c * nb + b); b += 1 }
            c += 1
          }
          rr += 1
        }
      }
    }

    val scaleOpt = fields.get(TagModelPixelScale).map(_.doubles)
    val tieOpt = fields.get(TagModelTiepoint).map(_.doubles)
    if (requireGeo && (scaleOpt.isEmpty || tieOpt.isEmpty))
      throw new IllegalArgumentException(
        "TIFF has no ModelPixelScale/ModelTiepoint — not a GeoTIFF " +
          "(use decodeRaster for plain TIFFs)")
    val (sx, sy) = scaleOpt.map(s => (s(0), s(1))).getOrElse((1.0, 1.0))
    // tiepoint (i, j, k, X, Y, Z): raster point (i,j) sits at model (X,Y)
    val originX = tieOpt.map(t => t(3) - t(0) * sx).getOrElse(0.0)
    val originY = tieOpt.map(t => t(4) + t(1) * sy).getOrElse(ny.toDouble)
    val epsg = fields.get(TagGeoKeyDirectory).map(_.longs).map { keys =>
      val entries = keys.drop(4).grouped(4).toSeq
      def key(id: Int): Option[Int] = entries.collectFirst {
        case Array(k, loc, _, v) if k == id && loc == 0 => v.toInt
      }
      key(3072).orElse(key(2048)).getOrElse(0)
    }.getOrElse(0)
    val nodata = fields.get(TagGdalNodata).map(_.ascii).flatMap { s =>
      // GDAL writes lowercase "nan"; Double.parseDouble wants "NaN"
      if (s.equalsIgnoreCase("nan")) Some(Double.NaN)
      else try Some(s.toDouble) catch { case _: NumberFormatException => None }
    }
    Decoded(nx, ny, nb, Georef(epsg, sx, sy, originX, originY), nodata, samples)
  }

  // ------------------------------------------------------- Spark surface

  /** One decoded raster cell (pixel-center coordinates). */
  final case class TifCell(file: String, band: Int, x: Double, y: Double, v: Double)

  /** Summary row for one written tile file. */
  final case class TileWritten(file: String, tile_e: Long, tile_n: Long,
                               cells: Long, bytes: Long)

  /** `from_geotif` (mapData.py:39-94) over a DIRECTORY of granules:
    * each `.tif` decodes on an executor via the binaryFile source —
    * the per-file work is embarrassingly parallel.  `bounds`
    * (`((x0,x1),(y0,y1))`) and `skip` follow the reference exactly:
    * pixel-center window selection (mapData.py:60-62), then every
    * skip-th row/column OF THE WINDOW (mapData.py:70-79); cells equal
    * to the file's nodata (or non-finite) are dropped, the table form
    * of the reference's nodata→NaN masking (mapData.py:81-84).
    */
  def read(spark: SparkSession, dir: String,
           bounds: Option[((Double, Double), (Double, Double))] = None,
           skip: Int = 1): Dataset[TifCell] = {
    import spark.implicits._
    require(skip >= 1, "skip must be >= 1")
    spark.read.format("binaryFile").option("pathGlobFilter", "*.tif").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) => cellsOf(path, content, bounds, skip) }
  }

  private def cellsOf(path: String, content: Array[Byte],
                      bounds: Option[((Double, Double), (Double, Double))],
                      skip: Int): Iterator[TifCell] = {
    val d = decode(content)
    val cols0 = (0 until d.nx).filter { c =>
      bounds.forall { case ((x0, x1), _) => val x = d.xCenter(c); x >= x0 && x <= x1 }
    }
    val rows0 = (0 until d.ny).filter { r =>
      bounds.forall { case (_, (y0, y1)) => val y = d.yCenter(r); y >= y0 && y <= y1 }
    }
    val cols = cols0.grouped(skip).map(_.head).toArray
    val rows = rows0.grouped(skip).map(_.head).toArray
    val bad = d.nodata.getOrElse(Double.NaN)
    for {
      b <- Iterator.range(0, d.bands)
      r <- rows.iterator
      c <- cols.iterator
      v = d.samples(b)(r * d.nx + c)
      if !v.isNaN && !(v == bad)
    } yield TifCell(path, b, d.xCenter(c), d.yCenter(r), v)
  }

  /** Read a single-band granule directory back as the engine's grid
    * table `(gx, gy, gz)` — the inverse of [[writeTiles]] (cell nodes
    * are the pixel centers; lossless for float64 granules).
    */
  def readGrid(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir).toDF()
      .filter(col("band") === 0)
      .select(round(col("x")).cast("long").as("gx"),
              round(col("y")).cast("long").as("gy"),
              col("v").as("gz"))

  /** `to_geotif` (mapData.py:125-158) for a distributed grid: the
    * grid table `(gx, gy, gz)` lands as one float64 GeoTIFF per
    * `tileSize`-sized tile, encoded ON THE EXECUTORS (repartition by
    * tile key → mapPartitions; a tile is bounded, the whole raster is
    * not).  Pixel centers sit exactly on the grid nodes, so a
    * float64 write→read round-trip is bit-exact.  Returns one
    * summary row per file (manifest-sized).  Tiles are written
    * through the Hadoop FileSystem API resolved from `dir`'s scheme
    * with the session's Hadoop conf broadcast to the executors, so
    * the same call works on local paths (tests) and on a shared
    * store (hdfs:///dfs-mounted paths) where driver and executors
    * do NOT share a local disk.
    */
  def writeTiles(grid: DataFrame, dir: String, epsg: Int, delta: Double,
                 tileSize: Double, compression: String = "deflate"): Seq[TileWritten] = {
    val spark = grid.sparkSession
    import spark.implicits._
    val hconf = spark.sparkContext.broadcast(
      new SerHadoopConf(spark.sparkContext.hadoopConfiguration))
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(dirPath)
    val written = grid
      .select(col("gx").cast("double").as("gx"), col("gy").cast("double").as("gy"),
              col("gz").cast("double").as("gz"))
      .withColumn("tile_e", (floor(col("gx") / tileSize) * tileSize).cast("long"))
      .withColumn("tile_n", (floor(col("gy") / tileSize) * tileSize).cast("long"))
      .repartition(col("tile_e"), col("tile_n"))
      .sortWithinPartitions("tile_e", "tile_n")
      .as[(Double, Double, Double, Long, Long)]
      .mapPartitions { it =>
        GranuleGroups.byKey(it)(t => (t._4, t._5)).map { case ((e, n), cells) =>
          val gxs = cells.map(_._1); val gys = cells.map(_._2)
          val (minX, maxX) = (gxs.min, gxs.max)
          val (minY, maxY) = (gys.min, gys.max)
          val nx = math.round((maxX - minX) / delta).toInt + 1
          val ny = math.round((maxY - minY) / delta).toInt + 1
          val arr = Array.fill(nx * ny)(Double.NaN)
          cells.foreach { case (gx, gy, gz, _, _) =>
            val c = math.round((gx - minX) / delta).toInt
            val r = math.round((maxY - gy) / delta).toInt
            arr(r * nx + c) = gz
          }
          val ref = Georef(epsg, delta, delta, minX - delta / 2, maxY + delta / 2)
          val bytes = encode(Array(arr), nx, ny, ref, bits = 64,
            compression = compression)
          val file = s"$dir/E${e}_N${n}.tif"
          val p = new org.apache.hadoop.fs.Path(file)
          val fs = p.getFileSystem(hconf.value.conf)
          val os = fs.create(p, true)
          try os.write(bytes) finally os.close()
          TileWritten(file, e, n, cells.size.toLong, bytes.length.toLong)
        }
      }
      .collect().toSeq
    val metaPath = new org.apache.hadoop.fs.Path(dir, "raster.json")
    val mfs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mos = mfs.create(metaPath, true)
    try mos.write(
      s"""{"epsg":$epsg,"delta":$delta,"tile_size":$tileSize}""".getBytes("UTF-8"))
    finally mos.close()
    written
  }
}

/** Java-serializable carrier for a Hadoop `Configuration` (which is
  * `Writable`, not `Serializable`) so executors resolve the same
  * FileSystem the driver would — the standard broadcast-conf idiom.
  */
private[sources] final class SerHadoopConf(
    @transient private var c: org.apache.hadoop.conf.Configuration)
  extends Serializable {
  def conf: org.apache.hadoop.conf.Configuration = c
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject(); c.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    c = new org.apache.hadoop.conf.Configuration(false)
    c.readFields(in)
  }
}
