package graft

import graft.ingest.{Las, Laz14}

class Laz14Spec extends SparkSuite {

  private def q(v: Double): Double = math.floor(v / Laz14.Scale + 0.5) * Laz14.Scale

  // deterministic flight-line-ish fmt-6 cloud exercising every layer:
  // channel switches (all four contexts), return-number walks, intensity
  // ramps, scan-angle sweeps, gps-time sequences, full-byte classes
  private def cloud(n: Int, seed: Long): Array[Las.P6] = {
    var s = seed
    def nxt(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s >>> 11 }
    var x = 1000.0; var y = -2000.0; var z = 150.0; var t = 300000.0
    Array.tabulate(n) { i =>
      x += (nxt() % 2000).toDouble / 1e6 - 0.0005
      y += (nxt() % 1000).toDouble / 1e6
      z += (nxt() % 600).toDouble / 1e6 - 0.0003
      if (nxt() % 97 == 0) z += 25.5
      t += (nxt() % 1000).toDouble * 1e-7
      val nret = (nxt() % 5 + 1).toInt
      val ret = (nxt() % nret + 1).toInt
      val chan = if (nxt() % 11 == 0) (nxt() % 4).toInt else -1
      Las.P6(q(x), q(y), q(z),
        intensity = ((nxt() % 7) * 111).toInt,
        returnNo = ret, nReturns = nret,
        channel = if (chan < 0) (i / 50) % 4 else chan,
        classification = if (nxt() % 13 == 0) 200 else (i % 3) + 1,
        scanAngle = ((nxt() % 20000) - 10000).toInt,
        sourceId = ((nxt() % 3) * 17).toInt,
        gpsTime = t)
    }
  }

  test("POINT14 layered round-trips a full fmt-6 cloud exactly (single chunk)") {
    val pts = cloud(3000, 42L)
    val bytes = Laz14.encode(pts)
    val back = Laz14.decode(bytes)
    assert(back.length == pts.length)
    for (i <- pts.indices)
      assert(back(i) == pts(i), s"point $i: ${back(i)} vs ${pts(i)}")
    // layered arithmetic coding beats the raw 1.4 container
    assert(bytes.length < Las.encode14(pts).length,
      s"laz14 ${bytes.length} >= las14 ${Las.encode14(pts).length}")
  }

  test("chunk boundaries restart all four contexts losslessly") {
    for ((n, chunk) <- Seq((1000, 256), (1024, 256), (257, 256), (5, 2), (1, 7))) {
      val pts = cloud(n, n.toLong * 31 + chunk)
      val back = Laz14.decode(Laz14.encode(pts, chunkSize = chunk))
      assert(back.toSeq == pts.toSeq, s"n=$n chunk=$chunk")
    }
  }

  test("selective decompression: pruned layers' bytes are never decoded") {
    val pts = cloud(2000, 7L)
    val bytes = Laz14.encode(pts, chunkSize = 512)
    val l = Laz14.layout(bytes)
    // xyz-only pass (the DSv2 select(x,y,z) shape)
    val xyz = (0 until l.numChunks).flatMap(c =>
      Laz14.decodeChunk(bytes, l, c, need = Laz14.NeedZ))
    assert(xyz.length == pts.length)
    for (i <- pts.indices) {
      assert(xyz(i).x == pts(i).x && xyz(i).y == pts(i).y && xyz(i).z == pts(i).z,
        s"xyz $i")
      assert(xyz(i).returnNo == pts(i).returnNo &&
        xyz(i).nReturns == pts(i).nReturns && xyz(i).channel == pts(i).channel,
        s"layer-1 fields $i")
      // pruned layers come back as defaults
      assert(xyz(i).classification == 0 && xyz(i).gpsTime == 0.0, s"pruned $i")
    }
    // class+gps pass, z pruned
    val cg = (0 until l.numChunks).flatMap(c =>
      Laz14.decodeChunk(bytes, l, c, need = Laz14.NeedClass | Laz14.NeedGps))
    for (i <- pts.indices)
      assert(cg(i).classification == pts(i).classification &&
        cg(i).gpsTime == pts(i).gpsTime && cg(i).z == 0.0, s"cg $i")
  }

  test("adversarial fields: extremes, constants, context ping-pong") {
    val ext = 2147.483647
    val base = Las.P6(0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 0.0)
    val pts = Array(
      base,
      base, // fully unchanged (changed byte == 0)
      base.copy(x = ext, y = -ext, z = ext, intensity = 0xffff,
        returnNo = 15, nReturns = 15, channel = 3, classification = 255,
        scanAngle = Short.MaxValue, sourceId = 0xffff, gpsTime = 1e9),
      base.copy(x = -ext, y = ext, z = -ext, channel = 1,
        scanAngle = Short.MinValue, gpsTime = -1.5e-300),
      base.copy(channel = 2, gpsTime = Double.MinPositiveValue),
      base.copy(channel = 3, returnNo = 2, nReturns = 3),
      base.copy(channel = 0, gpsTime = 86399.999999),
      base.copy(channel = 3))
    val back = Laz14.decode(Laz14.encode(pts, chunkSize = 3))
    assert(back.toSeq == pts.toSeq)
  }

  test("corrupt containers throw IllegalArgumentException by name") {
    val good = Laz14.encode(cloud(100, 5L))
    def bad(mut: Array[Byte] => Unit): Unit = {
      val b = good.clone(); mut(b)
      intercept[IllegalArgumentException](Laz14.decode(b))
    }
    bad(_(0) = 'X')                          // signature
    bad(_(25) = 2)                           // version 1.2
    bad(_(104) = 6)                          // compression bit cleared
    bad { b => b(107) = 1 }                  // legacy count nonzero
    bad { b =>                               // chunk-table offset past EOF
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putLong(bb.getInt(96), b.length.toLong + 100)
    }
    intercept[IllegalArgumentException](Laz14.decode(good.take(300)))
  }

  test("empty input round-trips") {
    assert(Laz14.decode(Laz14.encode(Array.empty[Las.P6])).isEmpty)
  }

  test("tilesToPointsChunked decodes tile-parallel and matches Las path") {
    import spark.implicits._
    val pts = cloud(4000, 99L)
    val tiles = spark.createDataset(Seq(
        (0, Laz14.encode(pts.take(2000), chunkSize = 300)),
        (1, Laz14.encode(pts.drop(2000), chunkSize = 300))))
      .toDF("tile_id", "data")
    val back = Laz14.tilesToPointsChunked(tiles)
      .orderBy("tile_id", "gps_time")
      .collect()
    assert(back.length == 4000)
    val exp = pts.take(2000).sortBy(_.gpsTime) ++ pts.drop(2000).sortBy(_.gpsTime)
    for (i <- exp.indices) {
      val r = back(i)
      assert(r.getDouble(1) == exp(i).x && r.getDouble(2) == exp(i).y &&
        r.getDouble(3) == exp(i).z &&
        r.getInt(8) == exp(i).classification &&
        r.getDouble(11) == exp(i).gpsTime, s"row $i")
    }
  }
}
