package graft

import graft.ingest.{Las, Laz}

class LazSpec extends SparkSuite {
  import spark.implicits._

  private def q(v: Double): Double = math.floor(v / Laz.Scale + 0.5) * Laz.Scale

  // deterministic pseudo-random clustered cloud: flight-line-ish x/y walk
  // with occasional class/jump changes — exercises the changed-values
  // flags, both dx/dy sign regimes, and the streaming medians
  private def cloud(n: Int, seed: Long): Array[(Double, Double, Double, Int)] = {
    var s = seed
    def nxt(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s >>> 11 }
    var x = 1000.0; var y = -2000.0; var z = 150.0
    Array.tabulate(n) { i =>
      x += (nxt() % 2000).toDouble / 1e6 - 0.0005
      y += (nxt() % 1000).toDouble / 1e6
      z += (nxt() % 600).toDouble / 1e6 - 0.0003
      if (nxt() % 97 == 0) z += 25.5 // canopy jump
      val c = if (nxt() % 13 == 0) 7 else if (i % 3 == 0) 2 else 1
      (q(x), q(y), q(z), c)
    }
  }

  test("LAZ round-trips a clustered cloud exactly (single chunk)") {
    val pts = cloud(3000, 42L)
    val bytes = Laz.encode(pts)
    val back = Laz.decode(bytes)
    assert(back.length == pts.length)
    for (i <- pts.indices)
      assert(back(i) == pts(i), s"point $i: ${back(i)} vs ${pts(i)}")
    // and it actually compresses: clustered deltas should beat raw LAS
    assert(bytes.length < Las.encode(pts).length,
      s"laz ${bytes.length} >= las ${Las.encode(pts).length}")
  }

  test("chunk boundaries restart state losslessly (n % chunk != 0 and == 0)") {
    for ((n, chunk) <- Seq((1000, 256), (1024, 256), (257, 256), (5, 2), (1, 7))) {
      val pts = cloud(n, n.toLong * 31 + chunk)
      val back = Laz.decode(Laz.encode(pts, chunkSize = chunk))
      assert(back.toSeq == pts.toSeq, s"n=$n chunk=$chunk")
    }
  }

  test("adversarial coordinates: constants, int32 extremes, sign flips") {
    val ext = 2147.483647 // int32 max at 1e-6 scale
    val pts = Array(
      (0.0, 0.0, 0.0, 0),
      (0.0, 0.0, 0.0, 0), // fully unchanged point (changed_values == 0)
      (ext, -ext, ext, 255),
      (-ext, ext, -ext, 1),
      (ext, ext, ext, 31),
      (0.000001, -0.000001, 0.000001, 31),
      (0.000001, -0.000001, 0.000001, 31),
      (-1.5, 2.25, -3.125, 2))
    val back = Laz.decode(Laz.encode(pts, chunkSize = 3))
    assert(back.toSeq == pts.toSeq)
  }

  test("format-1 GPS times round-trip bit-exact across patterns") {
    // regular increments (multiplier path), repeats (unchanged path),
    // jitter (0diff re-syncs), huge jumps (full 64-bit path), negatives,
    // and non-finite bit patterns
    val times = Array(
      315964800.0, 315964800.0001, 315964800.0002, 315964800.0003,
      315964800.0003, 315964800.0003, // unchanged
      315964800.5, 315964801.0, 315964801.5, // bigger regular steps
      -12345.678, 9.87e300, 9.87e300 + 1e288, // huge jumps, full writes
      Double.MinPositiveValue, 0.0, -0.0,
      java.lang.Double.longBitsToDouble(0x7ff8000000000123L)) // NaN payload
    val pts = times.zipWithIndex.map { case (t, i) =>
      (q(i * 0.25), q(i * -0.5), q(100.0 + i), i % 32, t)
    }
    val back = Laz.decodeTimed(Laz.encodeTimed(pts, chunkSize = 6))
    assert(back.length == pts.length)
    for (i <- pts.indices) {
      assert((back(i)._1, back(i)._2, back(i)._3, back(i)._4) ==
        (pts(i)._1, pts(i)._2, pts(i)._3, pts(i)._4), s"xyzc $i")
      assert(java.lang.Double.doubleToRawLongBits(back(i)._5) ==
        java.lang.Double.doubleToRawLongBits(pts(i)._5), s"gps bits $i")
    }
  }

  test("format-1 sawtooth and multi-sequence interleaved times") {
    // two interleaved emitters (e.g. two lasers) — the 4-sequence state
    // machine should latch both streams
    val pts = Array.tabulate(400) { i =>
      val t =
        if (i % 2 == 0) 1000.0 + i * 0.001 // stream A
        else 5.0e9 + i * 0.002 // stream B, far away
      (q(i * 0.001), q(i * 0.002), q(50.0), 1, t)
    }
    val back = Laz.decodeTimed(Laz.encodeTimed(pts, chunkSize = 128))
    for (i <- pts.indices)
      assert(java.lang.Double.doubleToRawLongBits(back(i)._5) ==
        java.lang.Double.doubleToRawLongBits(pts(i)._5), s"gps $i")
  }

  test("container fields: LASF, compressed-format bit, laszip VLR, count") {
    val pts = cloud(100, 7L)
    val bytes = Laz.encode(pts)
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(new String(bytes, 0, 4) == "LASF")
    assert((b.get(104) & 0x80) != 0 && (b.get(104) & 0x7f) == 0)
    assert(b.getInt(100) == 1) // one VLR
    assert(b.getInt(107) == pts.length)
    val vlrOff = 227
    assert(new String(bytes, vlrOff + 2, 14, "US-ASCII") == "laszip encoded")
    assert((b.getShort(vlrOff + 18) & 0xffff) == 22204)
    // uncompressed Las decoder must refuse it, and vice versa
    intercept[IllegalArgumentException] { Las.decode(bytes) }
    intercept[IllegalArgumentException] { Laz.decode(Las.encode(pts)) }
  }

  test("corrupt chunk-table offsets are rejected with clear errors") {
    val bytes = Laz.encode(cloud(100, 7L))
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataOff = b.getInt(96)
    // LASzip sentinel -1 (non-seekable writer): explicit, named rejection
    val sentinel = bytes.clone()
    java.nio.ByteBuffer.wrap(sentinel).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putLong(dataOff, -1L)
    val e1 = intercept[IllegalArgumentException] { Laz.layout(sentinel) }
    assert(e1.getMessage.contains("sentinel"))
    // offset beyond EOF (e.g. a >2 GiB file truncated into memory)
    val big = bytes.clone()
    java.nio.ByteBuffer.wrap(big).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putLong(dataOff, 3L * 1024 * 1024 * 1024)
    val e2 = intercept[IllegalArgumentException] { Laz.layout(big) }
    assert(e2.getMessage.contains("outside"))
    // offset pointing before the data start (garbage)
    val neg = bytes.clone()
    java.nio.ByteBuffer.wrap(neg).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putLong(dataOff, 4L)
    intercept[IllegalArgumentException] { Laz.layout(neg) }
  }

  test("tilesToPoints decodes LAZ tiles in executors") {
    val a = cloud(300, 1L); val b = cloud(200, 2L)
    val tiles = Seq((1, Laz.encode(a, chunkSize = 128)), (2, Laz.encode(b)))
      .toDF("tile_id", "data")
    val got = Laz.tilesToPoints(tiles).groupBy("tile_id").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((1, 300L), (2, 200L)))
  }

  test("chunk-parallel decode equals sequential decode") {
    val pts = cloud(1500, 55L)
    val bytes = Laz.encode(pts, chunkSize = 200)
    val l = Laz.layout(bytes)
    assert(l.numChunks == 8 && l.chunkCount(7) == 100)
    // chunks decoded OUT OF ORDER compose to the sequential result
    val shuffled = Seq(5, 0, 7, 2, 6, 1, 4, 3)
      .map(c => c -> Laz.decodeChunkTimed(bytes, l, c)).sortBy(_._1)
      .flatMap(_._2).map(p => (p._1, p._2, p._3, p._4))
    assert(shuffled == pts.toSeq)
    // and the DataFrame boundary agrees with the tile-parallel one
    val tiles = Seq((1, bytes)).toDF("tile_id", "data")
    val a = Laz.tilesToPointsChunked(tiles).orderBy("x", "y", "z").collect().toSeq
    val b = Laz.tilesToPoints(tiles).orderBy("x", "y", "z").collect().toSeq
    assert(a == b && a.length == 1500)
  }

  test("LAZ decode agrees with LAS decode on identical input") {
    val pts = cloud(2000, 99L)
    val viaLas = Las.decode(Las.encode(pts)).toSeq
    val viaLaz = Laz.decode(Laz.encode(pts, chunkSize = 777)).toSeq
    assert(viaLas == viaLaz)
  }
}
