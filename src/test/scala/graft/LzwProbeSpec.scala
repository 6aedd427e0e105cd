package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scratch probe: find the JDK encoder's LZW width-bump schedule. */
class LzwProbeSpec extends AnyFunSuite {
  test("probe width-bump offsets against a JDK LZW stream") {
    import java.awt.image.BufferedImage
    import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
    val (nx, ny) = (41, 17)
    val img = new BufferedImage(nx, ny, BufferedImage.TYPE_BYTE_GRAY)
    for (r <- 0 until ny; c <- 0 until nx)
      img.getRaster.setSample(c, r, 0, (r * nx + c) * 7 % 256)
    val w = ImageIO.getImageWritersByFormatName("tiff").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType("LZW")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    w.setOutput(ios); w.write(null, new IIOImage(img, null, null), p); ios.close()
    val bytes = bos.toByteArray
    // locate the strip: parse IFD minimally (big-endian)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val ifd = bb.getInt(4)
    val n = bb.getShort(ifd) & 0xffff
    var stripOff = -1; var stripLen = -1; var rps = ny
    for (i <- 0 until n) {
      val e = ifd + 2 + i * 12
      val tag = bb.getShort(e) & 0xffff
      val typ = bb.getShort(e + 2) & 0xffff
      def v: Int = if (typ == 3) bb.getShort(e + 8) & 0xffff else bb.getInt(e + 8)
      if (tag == 273) stripOff = v
      if (tag == 279) stripLen = v
      if (tag == 278) rps = v
    }
    info(s"strip at $stripOff len $stripLen rowsPerStrip $rps of $ny rows")
    assert(rps >= ny, "multi-strip; probe assumes one strip")
    val chunk = java.util.Arrays.copyOfRange(bytes, stripOff, stripOff + stripLen)
    val expect = Array.tabulate(nx * ny)(i => (i * 7 % 256).toByte)
    for (off <- -2 to 2) {
      val got = scala.util.Try(
        graft.sources.GeoTiff.lzwDecodeProbe(chunk, nx * ny, off))
      val verdict = got match {
        case scala.util.Success(a) if a.sameElements(expect) => "EXACT"
        case scala.util.Success(a) => s"wrong bytes (${a.length})"
        case scala.util.Failure(e) => e.getMessage.take(40)
      }
      info(s"bump offset $off: $verdict")
    }
  }
}
