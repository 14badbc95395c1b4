package graft

import graft.geom.Wkb

class WkbSpec extends SparkSuite {

  private val tri: Array[Array[(Double, Double)]] =
    Array(Array((0.0, 0.0), (10.0, 0.0), (5.0, 8.0), (0.0, 0.0)))
  private val twoRing: Array[Array[(Double, Double)]] = Array(
    Array((-1.5, -2.25), (9.0, -2.25), (9.0, 7.5), (-1.5, -2.25)),
    Array((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 1.0)))

  test("polygon and multipolygon round-trip bit-exactly") {
    val p = Wkb.decode(Wkb.encodePolygon(twoRing))
    assert(p.length == 8 && p.forall(_._1 == 0))
    assert(p.filter(_._2 == 1).map(v => (v._4, v._5)).toSeq == twoRing(1).toSeq)
    val mp = Wkb.decode(Wkb.encodeMultiPolygon(Array(tri, twoRing)))
    assert(mp.count(_._1 == 0) == 4 && mp.count(_._1 == 1) == 8)
    assert(mp.filter(v => v._1 == 1 && v._2 == 0).map(v => (v._4, v._5)).toSeq ==
      twoRing(0).toSeq)
  }

  test("big-endian WKB decodes identically") {
    // hand-build the XDR form of `tri`: order=0, type/counts/doubles BE
    val b = java.nio.ByteBuffer.allocate(1 + 4 + 4 + 4 + 16 * 4)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    b.put(0.toByte).putInt(3).putInt(1).putInt(4)
    tri(0).foreach { case (x, y) => b.putDouble(x).putDouble(y) }
    assert(Wkb.decode(b.array()).map(v => (v._4, v._5)).toSeq == tri(0).toSeq)
  }

  test("junk, truncation, trailing bytes, wrong types throw") {
    intercept[IllegalArgumentException] { Wkb.decode("junk".getBytes) }
    val ok = Wkb.encodePolygon(tri)
    intercept[IllegalArgumentException] { Wkb.decode(ok.take(ok.length - 8)) }
    intercept[IllegalArgumentException] { Wkb.decode(ok ++ Array[Byte](0)) }
    val point = java.nio.ByteBuffer.allocate(21)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(1.toByte).putInt(1).putDouble(1.0).putDouble(2.0).array()
    intercept[IllegalArgumentException] { Wkb.decode(point) }
    // truncated INSIDE the ring/member count (bytes 5..8): must be the
    // codec's IllegalArgumentException, not a raw ByteBuffer IOOBE
    intercept[IllegalArgumentException] { Wkb.decode(ok.take(7)) }
    // nested multipolygon member under-check: a member header cut inside
    // its ring count rejects the same way
    val multi = Wkb.encodeMultiPolygon(Array(tri))
    intercept[IllegalArgumentException] { Wkb.decode(multi.take(9 + 7)) }
  }

  test("random geometries round-trip (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val coord = Gen.choose(-1e8, 1e8)
    val ring = for {
      n <- Gen.choose(3, 9)
      xs <- Gen.listOfN(n, coord); ys <- Gen.listOfN(n, coord)
    } yield xs.zip(ys).toArray
    val poly = Gen.choose(1, 3).flatMap(nr => Gen.listOfN(nr, ring)).map(_.toArray)
    (0 until 40).foreach { seed =>
      val p = poly.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val back = Wkb.decode(Wkb.encodePolygon(p))
      val regrouped = back.groupBy(_._2).toSeq.sortBy(_._1)
        .map(_._2.sortBy(_._3).map(v => (v._4, v._5)).toSeq)
      assert(regrouped == p.map(_.toSeq).toSeq, s"seed $seed")
      // multipolygon wrapper preserves member order and indices
      val mp = Wkb.decode(Wkb.encodeMultiPolygon(Array(p, p)))
      assert(mp.count(_._1 == 0) == mp.count(_._1 == 1), s"seed $seed mp")
    }
  }
}
