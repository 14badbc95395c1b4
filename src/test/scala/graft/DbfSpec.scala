package graft

import graft.ingest.Dbf
import graft.ingest.Dbf.Field

class DbfSpec extends SparkSuite {
  import spark.implicits._

  private val fields = Seq(
    Field("ID", 'N', 6), Field("NAME", 'C', 12), Field("BAL", 'N', 8))
  private val rows = Seq(
    Seq("1", "alpha", "100"),
    Seq("42", "beta gamma", "-99999"),
    Seq("999999", "x", "0"))

  test("encode → decode round-trips fields and values exactly") {
    val (fs, back) = Dbf.decode(Dbf.encode(fields, rows))
    assert(fs == fields)
    assert(back == rows)
  }

  test("container fields: version, counts, sizes, terminator, EOF") {
    val bytes = Dbf.encode(fields, rows)
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert((bytes(0) & 0x07) == 0x03)
    assert(b.getInt(4) == 3)
    val headerSize = b.getShort(8) & 0xFFFF
    val recSize = b.getShort(10) & 0xFFFF
    assert(headerSize == 32 + 32 * 3 + 1)
    assert(recSize == 1 + 6 + 12 + 8)
    assert(bytes(headerSize - 1) == 0x0D)
    assert(bytes.last == 0x1A)
    assert(bytes.length == headerSize + 3 * recSize + 1)
    // NAME cell of row 2 is left-justified space-padded
    val cell = new String(bytes, headerSize + recSize + 1 + 6, 12, "US-ASCII")
    assert(cell == "beta gamma  ")
  }

  test("deleted records are skipped; junk and truncation throw") {
    val bytes = Dbf.encode(fields, rows)
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val headerSize = b.getShort(8) & 0xFFFF
    val recSize = b.getShort(10) & 0xFFFF
    val del = bytes.clone()
    del(headerSize + recSize) = 0x2A // mark record 2 deleted
    val (_, kept) = Dbf.decode(del)
    assert(kept == Seq(rows.head, rows.last))
    intercept[IllegalArgumentException] { Dbf.decode("junk".getBytes) }
    intercept[IllegalArgumentException] { Dbf.decode(bytes.take(headerSize + 5)) }
    intercept[IllegalArgumentException] {
      Dbf.encode(fields, Seq(Seq("toolongvalue", "x", "0")))
    }
    intercept[IllegalArgumentException] { Field("WAYTOOLONGNAME", 'C', 5) }
  }

  test("tilesToRows decodes tile-parallel in executors") {
    val t1 = Dbf.encode(fields, rows)
    val t2 = Dbf.encode(fields, rows.take(1))
    val out = Dbf.tilesToRows(Seq((1, t1), (2, t2)).toDF("tile_id", "data"))
      .collect().map(r => (r.getInt(0), r.getInt(1),
        r.getSeq[String](2).toList)).sortBy(t => (t._1, t._2)).toSeq
    assert(out.map(t => (t._1, t._2)) == Seq((1, 1), (1, 2), (1, 3), (2, 1)))
    assert(out.head._3 == List("1", "alpha", "100"))
    assert(out(1)._3 == List("42", "beta gamma", "-99999"))
  }
}
