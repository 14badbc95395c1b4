package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.Gtx

class GtxSpec extends AnyFunSuite {

  private val hdr = Gtx.Header(37.5, -123.0, 0.025, 0.05, 5, 7)
  private def grid(nr: Int, nc: Int): Array[Array[Float]] =
    Array.tabulate(nr, nc)((r, c) => (r * nc + c) * 0.125f - 30.0f)

  test("encode/decode round-trips header and grid bit-exactly") {
    val bytes = Gtx.encode(hdr, grid(5, 7))
    assert(bytes.length == 40 + 4 * 35)
    val (h2, g2) = Gtx.decode(bytes)
    assert(h2 == hdr)
    for (r <- 0 until 5; c <- 0 until 7)
      assert(g2(r)(c) == (r * 7 + c) * 0.125 - 30.0, s"($r,$c)")
  }

  test("decodes a PINNED file written by CPython struct") {
    // tools/gtx_golden.gtx: >ddddii header + >f grid written by Python's
    // struct module — pins endianness/layout against an independent
    // writer, not a self-round-trip
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/gtx_golden.gtx"))
    val (h, g) = Gtx.decode(bytes)
    assert(h == hdr)
    for (r <- 0 until 5; c <- 0 until 7)
      assert(g(r)(c) == (r * 7 + c) * 0.125 - 30.0, s"($r,$c)")
  }

  test("corrupt input rejects by name") {
    val good = Gtx.encode(hdr, grid(5, 7))
    intercept[IllegalArgumentException](Gtx.decode(good.take(39)))
    intercept[IllegalArgumentException](Gtx.decode(good.take(100)))
    intercept[IllegalArgumentException](Gtx.decode(good ++ Array[Byte](0)))
    val badDims = good.clone()
    java.nio.ByteBuffer.wrap(badDims).putInt(32, -5)
    intercept[IllegalArgumentException](Gtx.decode(badDims))
    val badLat = good.clone()
    java.nio.ByteBuffer.wrap(badLat).putDouble(0, 123.0)
    intercept[IllegalArgumentException](Gtx.decode(badLat))
    val badSpacing = good.clone()
    java.nio.ByteBuffer.wrap(badSpacing).putDouble(16, 0.0)
    intercept[IllegalArgumentException](Gtx.decode(badSpacing))
    // huge dims must reject on the Long size check, not wrap Int
    val huge = good.clone()
    java.nio.ByteBuffer.wrap(huge).putInt(32, 1 << 30).putInt(36, 1 << 30)
    intercept[IllegalArgumentException](Gtx.decode(huge))
    // two ~2^31 dims would overflow even the 64-bit size product — the
    // dim bound fires first
    val huger = good.clone()
    java.nio.ByteBuffer.wrap(huger).putInt(32, Int.MaxValue).putInt(36, Int.MaxValue)
    intercept[IllegalArgumentException](Gtx.decode(huger))
  }

  test("bilinear undulation matches hand values and corner nodes") {
    val bytes = Gtx.encode(hdr, grid(5, 7))
    val (h, g) = Gtx.decode(bytes)
    // exactly on nodes
    assert(Gtx.undulationAt(h, g, 37.5, -123.0) == g(0)(0))
    // far corner: lat/lon arrive through inexact decimal arithmetic, so
    // the 4-term bilinear carries a few ulps
    assert(math.abs(Gtx.undulationAt(h, g,
      37.5 + 4 * 0.025, -123.0 + 6 * 0.05) - g(4)(6)) < 1e-10)
    // midpoint of the first cell = mean of its 4 corners
    val mid = Gtx.undulationAt(h, g, 37.5 + 0.0125, -123.0 + 0.025)
    assert(math.abs(mid - (g(0)(0) + g(0)(1) + g(1)(0) + g(1)(1)) / 4) < 1e-12)
    intercept[IllegalArgumentException](Gtx.undulationAt(h, g, 50.0, -123.0))
  }
}
