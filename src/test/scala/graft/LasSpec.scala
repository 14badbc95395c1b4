package graft

import graft.ingest.Las

class LasSpec extends SparkSuite {
  import spark.implicits._

  private val pts: Array[(Double, Double, Double, Int)] = Array(
    (0.0, 0.0, 100.0, 2),
    (63.999999, 63.999999, 129.999999, 1),
    (12.345678, 0.000001, 115.5, 7),
    (-5.25, -0.000001, -42.125, 18),
    (31.5, 47.25, 108.000001, 2))

  test("encode → decode round-trips 6-decimal coordinates exactly") {
    val back = Las.decode(Las.encode(pts))
    assert(back.length == pts.length)
    for (((x, y, z, c), i) <- pts.zipWithIndex) {
      val (x2, y2, z2, c2) = back(i)
      // every input is a 6-decimal value, so the scaled-int32 storage is
      // exact: decoded = round(v/1e-6) * 1e-6 must equal the same
      // expression applied directly
      def q(v: Double): Double = math.floor(v / Las.Scale + 0.5) * Las.Scale
      assert(x2 == q(x) && y2 == q(y) && z2 == q(z), s"point $i: $back")
      assert(c2 == c, s"classification $i")
    }
  }

  test("header carries count, scale, and bounds") {
    val bytes = Las.encode(pts)
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(new String(bytes, 0, 4) == "LASF")
    assert(b.get(24) == 1 && b.get(25) == 2) // version 1.2
    assert(b.getInt(107) == pts.length)
    assert(b.getDouble(131) == Las.Scale)
    assert(b.getDouble(179) == pts.map(_._1).max) // max x
    assert(b.getDouble(187) == pts.map(_._1).min) // min x
  }

  test("decoder rejects junk and unsupported formats") {
    intercept[IllegalArgumentException] { Las.decode("nope".getBytes) }
    val bytes = Las.encode(pts)
    bytes(104) = 6 // point format 6 (1.4) unsupported
    intercept[IllegalArgumentException] { Las.decode(bytes) }
  }

  test("format-1 round-trips GPS time bit-exact; format-0 decode still reads it") {
    val timed = pts.zipWithIndex.map { case ((x, y, z, c), i) =>
      (x, y, z, c, 315964800.0 + i * 0.000123 + i) }
    val bytes = Las.encodeTimed(timed)
    assert(bytes(104) == 1 && (java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getShort(105) & 0xffff) == 28)
    val back = Las.decodeTimed(bytes)
    for (((_, _, _, c, t), i) <- timed.zipWithIndex) {
      assert(java.lang.Double.doubleToLongBits(back(i)._5) ==
        java.lang.Double.doubleToLongBits(t), s"gps time $i")
      assert(back(i)._4 == c)
    }
    // the plain decoder walks format-1 records by recLen, dropping time
    assert(Las.decode(bytes).toSeq == Las.decode(Las.encode(pts)).toSeq)
    // format-0 bytes through the timed decoder yield the 0.0 sentinel
    assert(Las.decodeTimed(Las.encode(pts)).forall(_._5 == 0.0))
  }

  test("tilesToPointsTimed surfaces the gps_time column") {
    val timed = pts.map { case (x, y, z, c) => (x, y, z, c, x + z) }
    val tiles = Seq((9, Las.encodeTimed(timed))).toDF("tile_id", "data")
    val got = Las.tilesToPointsTimed(tiles).collect()
      .map(r => (r.getInt(4), r.getDouble(5))).sortBy(_._2).toSeq
    assert(got == timed.map(p => (p._4, p._1 + p._3)).sortBy(_._2).toSeq)
  }

  private val pts14: Array[Las.P6] = Array(
    Las.P6(0.0, 0.0, 100.0, 0, 1, 1, 0, 2, 0, 0, 0.0),
    Las.P6(63.999999, 63.999999, 129.999999, 65535, 3, 5, 3, 255,
      -30000, 65535, 315964800.123456),
    Las.P6(12.345678, 0.000001, 115.5, 777, 2, 2, 1, 64, 15000, 42,
      -1.5e-9),
    Las.P6(-5.25, -0.000001, -42.125, 1, 15, 15, 2, 18, 30000, 1,
      1.0e9 + 0.000001))

  test("LAS 1.4 fmt 6 round-trips every channel; header layout correct") {
    val bytes = Las.encode14(pts14)
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(b.get(24) == 1 && b.get(25) == 4)            // version 1.4
    assert((b.getShort(94) & 0xffff) == 375)            // header size
    assert((b.getShort(6) & 1) == 1)                    // adjusted GPS time
    assert(b.getInt(107) == 0)                          // legacy count 0
    assert(b.getLong(247) == pts14.length)              // u64 count
    assert(b.getLong(255) == 1 && b.getLong(255 + 8) == 1 &&
      b.getLong(255 + 16) == 1 && b.getLong(255 + 14 * 8) == 1,
      "by-return u64 counts")
    val (back, evlrs) = Las.decode14(bytes)
    assert(evlrs.isEmpty && back.length == pts14.length)
    def q(v: Double): Double = math.floor(v / Las.Scale + 0.5) * Las.Scale
    for ((p, i) <- pts14.zipWithIndex) {
      val g = back(i)
      assert(g.x == q(p.x) && g.y == q(p.y) && g.z == q(p.z), s"xyz $i")
      assert(java.lang.Double.doubleToLongBits(g.gpsTime) ==
        java.lang.Double.doubleToLongBits(p.gpsTime), s"gps $i")
      assert(g.copy(x = p.x, y = p.y, z = p.z) == p, s"channels $i")
    }
  }

  test("LAS 1.4 extended VLRs round-trip after the point records") {
    val payload = Array.tabulate[Byte](100)(i => (i * 7).toByte)
    val bytes = Las.encode14(pts14,
      Seq(("graft", 42, payload), ("LASF_Spec", 4, Array[Byte](1, 2))))
    val (_, evlrs) = Las.decode14(bytes)
    assert(evlrs.map(e => (e._1, e._2)) == Seq(("graft", 42), ("LASF_Spec", 4)))
    assert(evlrs(0)._3.toSeq == payload.toSeq && evlrs(1)._3.toSeq == Seq[Byte](1, 2))
  }

  test("LAS 1.4 decoder rejects corrupt input by name") {
    val good = Las.encode14(pts14)
    intercept[IllegalArgumentException] { Las.decode14("junk".getBytes) }
    // a 1.2 file through the 1.4 decoder
    intercept[IllegalArgumentException] { Las.decode14(Las.encode(pts)) }
    intercept[IllegalArgumentException] { Las.decode14(good.take(200)) }
    val badFmt = good.clone(); badFmt(104) = 7
    intercept[IllegalArgumentException] { Las.decode14(badFmt) }
    val badLegacy = good.clone()
    java.nio.ByteBuffer.wrap(badLegacy)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(107, 4)
    intercept[IllegalArgumentException] { Las.decode14(badLegacy) }
    val badCount = good.clone()
    java.nio.ByteBuffer.wrap(badCount)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(247, 1L << 40)
    intercept[IllegalArgumentException] { Las.decode14(badCount) }
    // EVLR payload length past file end
    val withE = Las.encode14(pts14, Seq(("graft", 1, Array[Byte](9))))
    val badE = withE.clone()
    java.nio.ByteBuffer.wrap(badE).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putLong(withE.length - 61 + 20, 1000L)
    intercept[IllegalArgumentException] { Las.decode14(badE) }
    // a u64 length near Long.MAX would wrap the Int+Long range check
    val badE2 = withE.clone()
    java.nio.ByteBuffer.wrap(badE2).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putLong(withE.length - 61 + 20, Long.MaxValue - 30)
    intercept[IllegalArgumentException] { Las.decode14(badE2) }
    // the 1.2 decoder still rejects fmt 6 (no silent misparse)
    intercept[IllegalArgumentException] { Las.decode(good) }
  }

  test("tilesToPoints14 surfaces all fmt-6 channels tile-parallel") {
    val tiles = Seq((1, Las.encode14(pts14.take(2))),
      (2, Las.encode14(pts14.drop(2)))).toDF("tile_id", "data")
    val got = Las.tilesToPoints14(tiles).collect()
    assert(got.length == pts14.length)
    val row = got.map(r => (r.getInt(0), r.getInt(8), r.getDouble(11))).sorted.toSeq
    assert(row == Seq((1, 2, 0.0), (1, 255, 315964800.123456),
      (2, 18, 1.0e9 + 0.000001), (2, 64, -1.5e-9)).sorted)
  }

  test("tilesToPoints decodes tile-parallel with ids attached") {
    val tiles = Seq((3, Las.encode(pts.take(2))), (4, Las.encode(pts.drop(2))))
      .toDF("tile_id", "data")
    val got = Las.tilesToPoints(tiles).collect()
      .map(r => (r.getInt(0), r.getInt(4))).sorted.toSeq
    assert(got == Seq((3, 1), (3, 2), (4, 2), (4, 7), (4, 18)).sorted)
  }
}
