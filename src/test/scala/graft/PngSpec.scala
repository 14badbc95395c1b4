package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.Png

/** PNG codec: round trips, plus CROSS-IMPLEMENTATION conformance against
  * the JDK's ImageIO PNG plugin in both directions — our bytes must
  * decode identically under ImageIO, and ImageIO-written PNGs (whose
  * encoder picks its own adaptive scanline filters) must decode
  * identically under ours. That pins the filter/zlib/chunk layers to an
  * independent implementation, not just to themselves. */
class PngSpec extends AnyFunSuite {

  private def lcgRows(w: Int, h: Int, channels: Int, maxv: Int,
                      seed: Long): Array[Array[Int]] = {
    var s = seed
    Array.fill(h, w * channels) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % (maxv + 1)).toInt + maxv + 1) % (maxv + 1)
    }
  }

  test("gray16 round trip is lossless") {
    val rows = lcgRows(37, 23, 1, 0xffff, 7L)
    val bytes = Png.encode(37, 23, 16, 1, rows)
    val (w, h, d, ch, out) = Png.decode(bytes)
    assert((w, h, d, ch) == (37, 23, 16, 1))
    for (r <- rows.indices) assert(out(r).sameElements(rows(r)), s"row $r")
  }

  test("rgb8 round trip is lossless and compresses smooth content") {
    val rows = lcgRows(64, 32, 3, 0xff, 11L)
    val bytes = Png.encode(64, 32, 8, 3, rows)
    val (w, h, d, ch, out) = Png.decode(bytes)
    assert((w, h, d, ch) == (64, 32, 8, 3))
    for (r <- rows.indices) assert(out(r).sameElements(rows(r)), s"row $r")
    // smooth gradient must compress well below raw size through Up filter
    val smooth = Array.tabulate(64, 64 * 3)((r, i) => (r + i / 3) & 0xff)
    val sb = Png.encode(64, 64, 8, 3, smooth)
    assert(sb.length < 64 * 64 * 3 / 4, s"no compression win: ${sb.length}")
  }

  test("ImageIO decodes our PNGs to identical pixels (gray16 + rgb8)") {
    val g = lcgRows(19, 13, 1, 0xffff, 3L)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Png.encode(19, 13, 16, 1, g)))
    assert(img.getWidth == 19 && img.getHeight == 13)
    val ras = img.getRaster
    for (r <- 0 until 13; c <- 0 until 19)
      assert(ras.getSample(c, r, 0) == g(r)(c), s"gray16 ($c,$r)")

    val rgb = lcgRows(21, 9, 3, 0xff, 5L)
    val im2 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Png.encode(21, 9, 8, 3, rgb)))
    for (r <- 0 until 9; c <- 0 until 21) {
      val p = im2.getRGB(c, r)
      assert(((p >> 16) & 0xff) == rgb(r)(3 * c) &&
        ((p >> 8) & 0xff) == rgb(r)(3 * c + 1) &&
        (p & 0xff) == rgb(r)(3 * c + 2), s"rgb ($c,$r)")
    }
  }

  test("our decoder reads ImageIO-written PNGs (adaptive filters)") {
    // RGB8 via TYPE_INT_RGB
    val w = 33; val h = 17
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = lcgRows(w, h, 3, 0xff, 13L)
    for (r <- 0 until h; c <- 0 until w)
      img.setRGB(c, r,
        (rgb(r)(3 * c) << 16) | (rgb(r)(3 * c + 1) << 8) | rgb(r)(3 * c + 2))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val (dw, dh, dd, dch, out) = Png.decode(bos.toByteArray)
    assert((dw, dh, dd, dch) == (w, h, 8, 3))
    for (r <- 0 until h) assert(out(r).sameElements(rgb(r)), s"row $r")

    // gray16 via TYPE_USHORT_GRAY
    val g16 = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val gray = lcgRows(w, h, 1, 0xffff, 17L)
    for (r <- 0 until h; c <- 0 until w)
      g16.getRaster.setSample(c, r, 0, gray(r)(c))
    val bos2 = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(g16, "png", bos2))
    val (_, _, d2, ch2, out2) = Png.decode(bos2.toByteArray)
    assert(d2 == 16 && ch2 == 1)
    for (r <- 0 until h) assert(out2(r).sameElements(gray(r)), s"gray row $r")
  }

  test("corruption is rejected: bad CRC, truncation, bad header") {
    val good = Png.encode(8, 8, 8, 1, lcgRows(8, 8, 1, 0xff, 1L))
    val flipped = good.clone()
    flipped(40) = (flipped(40) ^ 0x5a).toByte // inside IHDR/IDAT region
    intercept[Exception](Png.decode(flipped))
    intercept[Exception](Png.decode(good.take(good.length - 6)))
    intercept[Exception](Png.decode("nope".getBytes))
  }

  test("adversarial IHDR dims reject cleanly, not via wrapped Int sizes") {
    // patch width/height to 2^28 each (stride*height wraps negative in
    // Int) and fix the IHDR CRC so the dims check itself is what fires
    val good = Png.encode(8, 8, 8, 1, lcgRows(8, 8, 1, 0xff, 1L))
    val evil = good.clone()
    val ihdrData = 16 // 8-byte signature + 4-byte len + 4-byte type
    val b = java.nio.ByteBuffer.wrap(evil)
    b.putInt(ihdrData, 1 << 28).putInt(ihdrData + 4, 1 << 28)
    val crc = new java.util.zip.CRC32
    crc.update(evil, 12, 4 + 13) // chunk type + data
    b.putInt(ihdrData + 13, crc.getValue.toInt)
    val e = intercept[IllegalArgumentException](Png.decode(evil))
    assert(e.getMessage.contains("exceed supported size"), e.getMessage)
  }
}
