package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GeoTiff
import graft.sources.GeoTiff.Georef

/** Cross-implementation evidence for the GeoTIFF codec: the JDK
  * ships its own independent TIFF reader/writer
  * (`javax.imageio`, since JDK 9), so files written by one
  * implementation must decode identically in the other.  This is
  * what guards against a "round-trips against itself but not against
  * the world" codec — the LZW early-change bit timing, byte order,
  * strip layout, and sample packing are all checked against code we
  * did not write.
  */
class GeoTiffInteropSpec extends AnyFunSuite {

  private def jdkWrite(img: BufferedImage, compression: String): Array[Byte] = {
    val w = ImageIO.getImageWritersByFormatName("tiff").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType(compression)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    bos.toByteArray
  }

  private def grayImage(nx: Int, ny: Int): BufferedImage = {
    val img = new BufferedImage(nx, ny, BufferedImage.TYPE_BYTE_GRAY)
    for (r <- 0 until ny; c <- 0 until nx)
      img.getRaster.setSample(c, r, 0, (r * nx + c) * 7 % 256)
    img
  }

  test("JDK-written TIFFs (LZW / Deflate / ZLib, big-endian uint8) decode sample-exact") {
    val (nx, ny) = (41, 17) // awkward width: LZW code boundaries land mid-byte
    val img = grayImage(nx, ny)
    for (comp <- Seq("LZW", "Deflate", "ZLib")) {
      val bytes = jdkWrite(img, comp)
      val d = GeoTiff.decodeRaster(bytes)
      assert(d.nx == nx && d.ny == ny, s"$comp dims")
      for (r <- 0 until ny; c <- 0 until nx)
        assert(d.samples(0)(r * nx + c) == img.getRaster.getSample(c, r, 0).toDouble,
          s"$comp sample ($r,$c)")
    }
  }

  test("JDK-written RGB TIFF (3-band chunky) decodes band-exact") {
    val (nx, ny) = (13, 9)
    val img = new BufferedImage(nx, ny, BufferedImage.TYPE_3BYTE_BGR)
    for (r <- 0 until ny; c <- 0 until nx; b <- 0 until 3)
      img.getRaster.setSample(c, r, b, (r * 31 + c * 7 + b * 97) % 256)
    val d = GeoTiff.decodeRaster(jdkWrite(img, "LZW"))
    assert(d.bands == 3)
    for (r <- 0 until ny; c <- 0 until nx; b <- 0 until 3)
      assert(d.samples(b)(r * nx + c) == img.getRaster.getSample(c, r, b).toDouble,
        s"band $b ($r,$c)")
  }

  test("our float32 and float64 GeoTIFFs read back through the JDK reader") {
    val (nx, ny) = (7, 5)
    val band = Array.tabulate(nx * ny)(i => i * 1.5 - 3.0)
    val ref = Georef(3031, 100.0, 100.0, -50.0, 550.0)
    for ((bits, comp) <- Seq((32, "deflate"), (32, "lzw"), (32, "none"), (64, "deflate"))) {
      val mine = GeoTiff.encode(Array(band), nx, ny, ref, bits = bits, compression = comp)
      val img = ImageIO.read(new ByteArrayInputStream(mine))
      assert(img != null, s"JDK could not parse our bits=$bits comp=$comp file")
      assert(img.getWidth == nx && img.getHeight == ny, s"bits=$bits comp=$comp dims")
      for (r <- 0 until ny; c <- 0 until nx) {
        val expect = if (bits == 32) band(r * nx + c).toFloat.toDouble else band(r * nx + c)
        assert(img.getRaster.getSampleDouble(c, r, 0) == expect,
          s"bits=$bits comp=$comp sample ($r,$c)")
      }
    }
  }

  test("our predictor-2 integer writes decode in the JDK reader (LE/BE, striped/tiled, LZW/Deflate)") {
    // the JDK TIFF plugin only decodes the horizontal predictor for
    // 8-bit samples, so the third-party check runs on uint8; the
    // 16-bit BE carry path is pinned by the hand-assembled case in
    // GeoTiffSpec plus the own-decode matrix below
    val (nx, ny) = (37, 23)
    val band8 = Array.tabulate(nx * ny)(i => (((i % nx) * 5 + (i / nx) * 3 + (i * 7) % 5) % 256).toDouble)
    val ref = Georef(3031, 25.0, 25.0, 0.0, ny * 25.0)
    val cases = Seq(
      ("lzw", false, false), ("deflate", false, false), // LE striped
      ("deflate", true, false),                         // BE striped
      ("lzw", false, true), ("lzw", true, true))        // tiled, both orders
    for ((comp, be, tiled) <- cases) {
      val mine = GeoTiff.encode(Array(band8), nx, ny, ref, bits = 8,
        compression = comp, tiled = tiled, sampleFormat = 1, predictor = 2,
        bigEndian = be)
      val d = GeoTiff.decode(mine)
      assert(d.samples(0).sameElements(band8), s"own decode comp=$comp be=$be tiled=$tiled")
      val img = ImageIO.read(new ByteArrayInputStream(mine))
      assert(img != null, s"JDK could not parse comp=$comp be=$be tiled=$tiled")
      for (r <- 0 until ny; c <- 0 until nx)
        assert(img.getRaster.getSampleDouble(c, r, 0) == band8(r * nx + c),
          s"comp=$comp be=$be tiled=$tiled sample ($r,$c)")
    }
    // 16-bit predictor-2 with byte carries, both orders, own decode
    val band16 = Array.tabulate(nx * ny)(i => ((i * 257) % 65536).toDouble)
    for (be <- Seq(false, true)) {
      val mine = GeoTiff.encode(Array(band16), nx, ny, ref, bits = 16,
        compression = "lzw", sampleFormat = 1, predictor = 2, bigEndian = be)
      assert(GeoTiff.decode(mine).samples(0).sameElements(band16), s"16-bit be=$be")
    }
  }

  test("predictor-2 shrinks a smooth int DEM vs predictor-none") {
    val (nx, ny) = (128, 64)
    val band = Array.tabulate(nx * ny)(i => ((i % nx) * 3 + (i / nx) * 2 + 1000).toDouble)
    val ref = Georef(3031, 10.0, 10.0, 0.0, ny * 10.0)
    def size(pred: Int) = GeoTiff.encode(Array(band), nx, ny, ref, bits = 16,
      compression = "lzw", sampleFormat = 1, predictor = pred).length
    assert(size(2) < size(1), s"predictor-2 ${size(2)} should beat none ${size(1)}")
  }

  test("our LZW stream survives a JDK decode at dictionary-reset scale") {
    // >4094 dictionary entries forces at least one mid-stream table
    // reset — the hardest LZW corner (encoder and both decoders must
    // agree on the reset+width schedule)
    val nx = 257; val ny = 31
    val band = Array.tabulate(nx * ny)(i => ((i * 2654435761L) % 9973).toDouble)
    val ref = Georef(3031, 10.0, 10.0, 0.0, ny * 10.0)
    val mine = GeoTiff.encode(Array(band), nx, ny, ref, bits = 32, compression = "lzw")
    // our own decoder
    val d = GeoTiff.decode(mine)
    assert(d.samples(0).sameElements(band.map(_.toFloat.toDouble)))
    // the JDK's decoder
    val img = ImageIO.read(new ByteArrayInputStream(mine))
    assert(img != null, "JDK could not parse the reset-scale LZW file")
    for (r <- 0 until ny; c <- 0 until nx)
      assert(img.getRaster.getSampleDouble(c, r, 0) == band(r * nx + c).toFloat.toDouble,
        s"sample ($r,$c)")
  }
}
