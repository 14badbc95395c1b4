package graft

import graft.ingest.{Gpkg, Sqlite}
import graft.geom.Wkb

class GpkgSpec extends SparkSuite {
  import spark.implicits._

  private def poly(seed: Long): Array[Byte] = {
    val ring = Array.tabulate(4) { i =>
      ((seed * 31 + i * 7 % 97).toDouble, (seed * 17 + i * 13 % 89).toDouble)
    }
    Wkb.encodePolygon(Array(ring :+ ring.head))
  }

  test("sqlite varints and records round-trip") {
    val b = java.nio.ByteBuffer.allocate(32)
    for (v <- Seq(0L, 1L, 127L, 128L, 16383L, 16384L, Int.MaxValue.toLong,
        (1L << 40) - 3)) {
      b.clear(); Sqlite.putVarint(b, v)
      assert(Sqlite.getVarint(b.array(), 0) == ((v, Sqlite.varintLen(v))), s"$v")
    }
    val rec = Seq[Sqlite.Value](null, 42L, -7L, 123456789012L, 3.25,
      "héllo", Array[Byte](1, 2, 3))
    val got = Sqlite.decodeRecord(Sqlite.encodeRecord(rec), 0)
    assert(got.take(6) == rec.take(6))
    assert(got(6).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2, 3))
  }

  test("single-page and multi-page databases round-trip") {
    val small = Seq(1L, 2L, 3L).map(i => (i, Seq[Sqlite.Value](null, s"row$i", i * 10)))
    val db = Sqlite.encode("t", "CREATE TABLE t (a, b, c)", small)
    assert(Sqlite.decode(db, "t").map(r => (r._1, r._2(1), r._2(2))) ==
      small.map(r => (r._1, s"row${r._1}", r._1 * 10)))
    // force multiple leaves: 500 rows with ~50-byte payloads
    val big = (1L to 500L).map(i =>
      (i, Seq[Sqlite.Value](null, "x" * 40, i)))
    val db2 = Sqlite.encode("t", "CREATE TABLE t (a, b, c)", big)
    assert(db2.length > 3 * Sqlite.PageSize, "expected interior + several leaves")
    val back = Sqlite.decode(db2, "t")
    assert(back.map(_._1) == (1L to 500L))
    assert(back.forall(r => r._2(2) == r._1))
    intercept[IllegalArgumentException] { Sqlite.decode(db2, "missing") }
    intercept[IllegalArgumentException] { Sqlite.decode("junk".getBytes ++ new Array[Byte](4096), "t") }
  }

  test("interior capacity guard uses actual varint cell sizes") {
    // rowids >= 128 need 2-byte varints (8-byte interior cells), so the
    // one-interior-page ceiling is (4096-12)/8+1 = 511 leaves, NOT the
    // 582 a flat 7-byte estimate allows. ~3000-byte payloads force one
    // cell per leaf; 520 such rows used to pass the require and write a
    // silently corrupt interior page (cell content underflowing into the
    // pointer array) — they must reject loudly now.
    def rows(n: Int) = (0 until n).map(i =>
      (1000L + i, Seq[Sqlite.Value]("x" * 3000, i.toLong)))
    intercept[IllegalArgumentException] {
      Sqlite.encode("t", "CREATE TABLE t (a, b)", rows(520))
    }
    // at the true capacity boundary the encode still round-trips
    val ok = rows(505)
    val back = Sqlite.decode(
      Sqlite.encode("t", "CREATE TABLE t (a, b)", ok), "t")
    assert(back.map(_._1) == ok.map(_._1))
    assert(back.forall(r => r._2(1) == r._1 - 1000L))
  }

  test("decodes a PINNED database written by CPython's sqlite3") {
    // tools/sqlite_golden.db: 400 rows, 10 pages (interior + leaves),
    // INTEGER-PRIMARY-KEY rowid alias (column 0 stored as NULL), TEXT,
    // REAL, BLOB, and NULL-able TEXT — written by the real SQLite
    // library, so this pins varint/record/b-tree conformance against an
    // independent implementation, not a self-round-trip.
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/sqlite_golden.db"))
    val rows = Sqlite.decode(bytes, "golden")
    assert(rows.length == 400)
    assert(rows.map(_._1) == (1L to 400L))
    for ((rowid, vals) <- rows) {
      val i = rowid.toInt
      assert(vals(0) == null, s"rowid-alias column at $i") // id aliases rowid
      assert(vals(1) == f"row-$i%03d-" + "x" * (i % 37), s"name at $i")
      assert(vals(2) == i * 0.125 - 3.0, s"score at $i")
      val blob = vals(3).asInstanceOf[Array[Byte]]
      assert(blob.length == i % 61 &&
        blob.zipWithIndex.forall { case (v, j) => (v & 0xff) == (i * 7 + j) % 251 },
        s"payload at $i")
      assert(vals(4) == (if (i % 10 == 0) null else s"note$i"), s"note at $i")
    }
  }

  test("GPB blobs wrap and unwrap WKB with envelope and srs") {
    val wkb = poly(5)
    val gpb = Gpkg.encodeGpb(wkb)
    val (srs, back) = Gpkg.decodeGpb(gpb)
    assert(srs == Gpkg.Srid && back.toSeq == wkb.toSeq)
    // envelope indicator 0 (no envelope) decodes too
    val noEnv = gpb.take(8) ++ wkb
    noEnv(3) = 0x01 // LE, no envelope
    assert(Gpkg.decodeGpb(noEnv)._2.toSeq == wkb.toSeq)
    intercept[IllegalArgumentException] { Gpkg.decodeGpb("junk".getBytes) }
    val badVer = gpb.clone(); badVer(2) = 9
    intercept[IllegalArgumentException] { Gpkg.decodeGpb(badVer) }
  }

  test("feature tables round-trip and decode tile-parallel") {
    val feats = (1L to 60L).map(i => (i, s"feat$i", poly(i)))
    val db = Gpkg.encodeFeatures(feats)
    val back = Gpkg.decodeFeatures(db)
    assert(back.map(f => (f._1, f._2)) == feats.map(f => (f._1, f._2)))
    back.zip(feats).foreach { case (g, e) => assert(g._3.toSeq == e._3.toSeq) }
    val verts = Gpkg.tilesToVertices(Seq((1, db)).toDF("tile_id", "data"))
    assert(verts.count() == 60 * 5)
    assert(verts.filter($"fid" === 7 && $"pt_idx" === 0).count() == 1)
  }
}
