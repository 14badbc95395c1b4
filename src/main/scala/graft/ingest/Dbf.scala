package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pure-JVM dBASE III (.dbf) codec — the attribute sidecar of the ESRI
  * Shapefile ([[Shp]] carries the geometry; .dbf row i holds record i's
  * attributes), completing the reference's `_read_polygon_file` vector
  * source (stable_unstable_areas.py:288–306 reads geometry + attributes
  * through geopandas). Layout from the public dBASE III PLUS spec:
  * 32-byte header (version 0x03, LE record count / header size / record
  * size), 32-byte field descriptors (NUL-padded 11-byte names, type,
  * length, decimal count), 0x0D terminator, then fixed-width ASCII
  * records behind a 1-byte deletion flag, closed by 0x1A.
  *
  * Scope: character ('C', left-justified space-padded) and integer
  * numeric ('N' with 0 decimals, right-justified) fields — fractional
  * attributes ride as pre-scaled integer cents so cross-engine rounding
  * never enters the byte format. Deleted records (flag 0x2A) are
  * skipped on decode, matching every dBASE reader.
  */
object Dbf {

  final case class Field(name: String, ftype: Char, length: Int) {
    require(name.length <= 10, s"dBASE field names cap at 10 chars: $name")
    require(ftype == 'C' || ftype == 'N', s"unsupported field type $ftype")
    require(length >= 1 && length <= 254, s"field length out of range: $length")
  }

  /** Assemble a complete .dbf from string-valued rows (numeric fields
    * must already be rendered as integer strings). */
  def encode(fields: Seq[Field], rows: Seq[Seq[String]]): Array[Byte] = {
    require(fields.nonEmpty, "dbf needs at least one field")
    val recSize = 1 + fields.map(_.length).sum
    val headerSize = 32 + 32 * fields.length + 1
    val b = ByteBuffer.allocate(headerSize + recSize * rows.length + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x03.toByte)
    b.put(126.toByte).put(8.toByte).put(14.toByte) // last-update stamp (fixed)
    b.putInt(rows.length)
    b.putShort(headerSize.toShort)
    b.putShort(recSize.toShort)
    (0 until 20).foreach(_ => b.put(0.toByte))
    fields.foreach { f =>
      val name = f.name.getBytes(US_ASCII)
      b.put(name).put(new Array[Byte](11 - name.length)) // NUL-padded
      b.put(f.ftype.toByte)
      b.putInt(0) // reserved (field data address)
      b.put(f.length.toByte)
      b.put(0.toByte) // decimal count (integers only)
      (0 until 14).foreach(_ => b.put(0.toByte))
    }
    b.put(0x0D.toByte)
    rows.foreach { r =>
      require(r.length == fields.length, "row arity != field count")
      b.put(0x20.toByte) // active record
      r.zip(fields).foreach { case (v, f) =>
        require(v.length <= f.length, s"value '$v' overflows ${f.name}(${f.length})")
        val pad = " " * (f.length - v.length)
        val cell = if (f.ftype == 'N') pad + v else v + pad
        b.put(cell.getBytes(US_ASCII))
      }
    }
    b.put(0x1A.toByte) // EOF
    b.array()
  }

  /** Parse a .dbf: (fields, active rows as trimmed strings). Junk,
    * truncation, and unsupported versions/types throw. */
  def decode(bytes: Array[Byte]): (Seq[Field], Seq[Seq[String]]) = {
    require(bytes.length >= 33, "not a dbf: shorter than the header")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require((bytes(0) & 0x07) == 0x03, f"unsupported dbf version 0x${bytes(0)}%02x")
    val nRec = b.getInt(4)
    val headerSize = b.getShort(8) & 0xFFFF
    val recSize = b.getShort(10) & 0xFFFF
    val nFields = (headerSize - 33) / 32
    require(nRec >= 0 && nFields >= 1 && headerSize == 32 + 32 * nFields + 1,
      s"corrupt dbf header: $nRec records, header $headerSize")
    require(bytes.length >= headerSize + recSize.toLong * nRec,
      "dbf truncated before declared record count")
    require(bytes(headerSize - 1) == 0x0D, "missing field-terminator byte")
    val fields = (0 until nFields).map { i =>
      val off = 32 + 32 * i
      val nameEnd = (off until off + 11).find(bytes(_) == 0).getOrElse(off + 11)
      val f = Field(new String(bytes, off, nameEnd - off, US_ASCII),
        bytes(off + 11).toChar, bytes(off + 16) & 0xFF)
      require(bytes(off + 17) == 0, s"only integer N fields supported (${f.name})")
      f
    }
    require(recSize == 1 + fields.map(_.length).sum,
      "record size disagrees with field widths")
    val rows = Seq.newBuilder[Seq[String]]
    var off = headerSize
    var r = 0
    while (r < nRec) {
      val flag = bytes(off)
      require(flag == 0x20 || flag == 0x2A, s"record $r: bad deletion flag $flag")
      if (flag == 0x20) {
        var fo = off + 1
        rows += fields.map { f =>
          val v = new String(bytes, fo, f.length, US_ASCII)
          fo += f.length
          if (f.ftype == 'N') v.dropWhile(_ == ' ')
          else v.reverse.dropWhile(_ == ' ').reverse
        }
      }
      off += recSize
      r += 1
    }
    (fields, rows.result())
  }

  /** Tile-parallel attribute decode (the [[Shp.tilesToRings]] twin):
    * each row of `tiles` is (tile_id, one complete .dbf's bytes); rows
    * come back as (tile_id, rec_no, values). */
  def tilesToRows(tiles: DataFrame): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles.select(col("tile_id").cast("int"), col("data"))
      .as[(Int, Array[Byte])]
      .flatMap { case (id, data) =>
        decode(data)._2.iterator.zipWithIndex.map { case (vals, i) =>
          (id, i + 1, vals)
        }
      }
      .toDF("tile_id", "rec_no", "values")
  }
}
