package graft

import graft.ingest.Shp

class ShpSpec extends SparkSuite {
  import spark.implicits._

  // two polygons: a triangle and a two-ring polygon (outer + hole), with
  // negative, fractional, and extreme-ish coordinates
  private val tri: Shp.Poly =
    (7L, Array(Array((0.0, 0.0), (10.0, 0.0), (5.0, 8.0))))
  private val withHole: Shp.Poly =
    (9L, Array(
      Array((-100.5, -200.25), (300.125, -200.25), (300.125, 400.0), (-100.5, 400.0)),
      Array((0.000001, 0.000001), (1.5, 0.000001), (1.5, 1.5), (0.000001, 1.5))))

  test("encode → decode round-trips coordinates bit-exactly, rings closed") {
    val back = Shp.decode(Shp.encode(Seq(tri, withHole)))
    // record 1 = tri: one ring of 3 + closing vertex
    val r1 = back.filter(_._1 == 1)
    assert(r1.length == 4 && r1.forall(_._2 == 0))
    assert(r1.map(p => (p._4, p._5)).toSeq ==
      Seq((0.0, 0.0), (10.0, 0.0), (5.0, 8.0), (0.0, 0.0)))
    // record 2 = withHole: parts 0 and 1, each closed
    val r2 = back.filter(_._1 == 2)
    assert(r2.count(_._2 == 0) == 5 && r2.count(_._2 == 1) == 5)
    val outer = r2.filter(_._2 == 0).map(p => (p._4, p._5)).toSeq
    assert(outer.head == outer.last && outer.head == ((-100.5, -200.25)))
    val hole = r2.filter(_._2 == 1).map(p => (p._4, p._5)).toSeq
    assert(hole.head == hole.last && hole(1) == ((1.5, 0.000001)))
  }

  test("container fields: file code, version, type, length, bbox") {
    val bytes = Shp.encode(Seq(tri, withHole))
    val be = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
    val le = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(be.getInt(0) == 9994)
    assert(le.getInt(28) == 1000 && le.getInt(32) == 5)
    assert(be.getInt(24) * 2 == bytes.length)
    // file bbox spans both polygons
    assert(le.getDouble(36) == -100.5 && le.getDouble(44) == -200.25)
    assert(le.getDouble(52) == 300.125 && le.getDouble(60) == 400.0)
  }

  test("junk, truncation, and corrupt records are rejected") {
    intercept[IllegalArgumentException] { Shp.decode("junk".getBytes) }
    val bytes = Shp.encode(Seq(tri))
    intercept[IllegalArgumentException] { Shp.decode(bytes.take(99)) }
    // truncated mid-record: fix the header length field to match so the
    // failure comes from the record walk, not the length check
    val cut = bytes.take(bytes.length - 8)
    java.nio.ByteBuffer.wrap(cut).order(java.nio.ByteOrder.BIG_ENDIAN)
      .putInt(24, cut.length / 2)
    intercept[IllegalArgumentException] { Shp.decode(cut) }
    // point shape type (1) is refused
    val notPoly = bytes.clone()
    java.nio.ByteBuffer.wrap(notPoly).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(32, 1)
    intercept[IllegalArgumentException] { Shp.decode(notPoly) }
    // degenerate ring is refused at encode time
    intercept[IllegalArgumentException] {
      Shp.encode(Seq((1L, Array(Array((0.0, 0.0), (1.0, 1.0))))))
    }
  }

  test("random polygons round-trip bit-exactly (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val coordGen = Gen.oneOf(
      Gen.choose(-1e7, 1e7),                       // plain magnitudes
      Gen.choose(-1.0, 1.0).map(_ * 1e-9),         // denormal-ish tiny
      Gen.chooseNum(Long.MinValue, Long.MaxValue)  // arbitrary bit patterns
        .map(java.lang.Double.longBitsToDouble).suchThat(d =>
          !d.isNaN && !d.isInfinite))
    val ringGen = for {
      n <- Gen.choose(3, 12)
      xs <- Gen.listOfN(n, coordGen); ys <- Gen.listOfN(n, coordGen)
    } yield xs.zip(ys).toArray
    val polyGen = for {
      nr <- Gen.choose(1, 4); rings <- Gen.listOfN(nr, ringGen)
    } yield rings.toArray
    val fileGen = for {
      np <- Gen.choose(1, 6); ps <- Gen.listOfN(np, polyGen)
    } yield ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }
    (0 until 50).foreach { seed =>
      val polys = fileGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val back = Shp.decode(Shp.encode(polys))
      // regroup decoded points and compare against closed source rings
      val byRec = back.groupBy(_._1)
      assert(byRec.keySet == polys.indices.map(_ + 1).toSet, s"seed $seed")
      polys.zipWithIndex.foreach { case ((_, rings), pi) =>
        val rec = byRec(pi + 1).groupBy(_._2)
        assert(rec.keySet == rings.indices.toSet, s"seed $seed poly $pi")
        rings.zipWithIndex.foreach { case (ring, ri) =>
          val got = rec(ri).sortBy(_._3).map(p => (p._4, p._5)).toSeq
          // bit-exact comparison (covers -0.0 vs 0.0 and denormals)
          def bits(p: (Double, Double)) = (java.lang.Double.doubleToRawLongBits(p._1),
            java.lang.Double.doubleToRawLongBits(p._2))
          assert(got.map(bits) == (ring :+ ring.head).toSeq.map(bits),
            s"seed $seed poly $pi ring $ri")
        }
      }
    }
  }

  test("tilesToRings decodes tile-parallel in executors") {
    val t1 = Shp.encode(Seq(tri))
    val t2 = Shp.encode(Seq(withHole, tri))
    val rings = Shp.tilesToRings(Seq((1, t1), (2, t2)).toDF("tile_id", "data"))
    val counts = rings.groupBy("tile_id").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    assert(counts == Seq((1, 4L), (2, 14L)))
    // per-part point counts survive the DataFrame boundary
    val parts = rings.filter($"tile_id" === 2)
      .groupBy("rec_no", "part_idx").count()
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(parts == Seq((1, 0, 5L), (1, 1, 5L), (2, 0, 4L)))
  }
}
