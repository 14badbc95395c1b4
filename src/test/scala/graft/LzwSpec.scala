package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{GeoTiff, Lzw}
import graft.raster.GridMeta

/** TIFF-LZW codec: byte round trips across the 9→12-bit width
  * boundaries and the table-reset point, plus the GeoTIFF-level
  * compressed round trip in both strip and tile layouts. */
class LzwSpec extends AnyFunSuite {

  private def roundtrip(data: Array[Byte]): Unit = {
    val enc = Lzw.encode(data)
    val dec = Lzw.decode(enc)
    assert(dec.sameElements(data),
      s"round trip broke: in=${data.length}B out=${dec.length}B")
  }

  test("byte round trips: empty, short, repetitive, pseudo-random") {
    roundtrip(Array.empty[Byte])
    roundtrip(Array[Byte](0))
    roundtrip("TOBEORNOTTOBEORTOBEORNOT".getBytes("US-ASCII"))
    // long runs force KwKwK self-referential codes
    roundtrip(Array.fill(10000)(7.toByte))
    // enough distinct pairs to cross 510/1022/2046 width bumps AND the
    // 4093 table reset (deterministic LCG, no Random)
    var s = 12345L
    val pseudo = Array.fill(120000) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33).toByte
    }
    roundtrip(pseudo)
    // compresses: repetitive data should shrink
    assert(Lzw.encode(Array.fill(10000)(7.toByte)).length < 2000)
  }

  test("GeoTIFF LZW round trip, strip and tile layouts, 32/64-bit") {
    val meta = GridMeta(originX = 3.5, originY = -2.0, dx = 0.5, dy = 0.5,
      width = 40, height = 25, nodata = -9999.0)
    val rows: Array[Array[Double]] = Array.tabulate(25)(r => Array.tabulate(40)(c =>
      if ((r * 40 + c) % 11 == 0) -9999.0 else math.floor((r * 0.25 + c * 1.5) * 1e6 + 0.5) / 1e6))
    for (tile <- Seq[Option[(Int, Int)]](None, Some((16, 16)))) {
      val bytes = GeoTiff.encodeLzw(meta, rows, 64, tile)
      val (m2, r2) = GeoTiff.decode(bytes)
      assert(m2 == meta)
      assert(java.util.Arrays.deepEquals(
        r2.asInstanceOf[Array[AnyRef]], rows.asInstanceOf[Array[AnyRef]]),
        s"tile=$tile")
      // compressed file should be smaller than the uncompressed twin
      val plain = GeoTiff.encode(meta, rows, 64, tile)
      assert(bytes.length < plain.length, s"no compression win for tile=$tile")
    }
    val f32 = GeoTiff.encodeLzw(meta, rows.map(_.map(v => v.toFloat.toDouble)),
      32, Some((16, 16)))
    val (m3, r3) = GeoTiff.decode(f32)
    assert(m3 == meta)
    val want32 = rows.map(_.map(v => v.toFloat.toDouble))
    assert(java.util.Arrays.deepEquals(
      r3.asInstanceOf[Array[AnyRef]], want32.asInstanceOf[Array[AnyRef]]))
  }
}
