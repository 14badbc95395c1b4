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

  test("tilesToPoints decodes tile-parallel with ids attached") {
    val tiles = Seq((3, Las.encode(pts.take(2))), (4, Las.encode(pts.drop(2))))
      .toDF("tile_id", "data")
    val got = Las.tilesToPoints(tiles).collect()
      .map(r => (r.getInt(0), r.getInt(4))).sorted.toSeq
    assert(got == Seq((3, 1), (3, 2), (4, 2), (4, 7), (4, 18)).sorted)
  }
}
