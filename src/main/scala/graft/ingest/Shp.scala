package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pure-JVM ESRI Shapefile (.shp) polygon codec — the engine's vector
  * file source, closing the reference's `_read_polygon_file` ingest row
  * (stable_unstable_areas.py:288–306; differencing_functions.py:351–382
  * read shapefile/GeoJSON/GPKG polygons, fix up CRS, explode
  * multipolygons). Same spirit as [[GeoTiff]]/[[Las]]/[[Laz]]: the
  * container layout comes from the public spec (ESRI Shapefile Technical
  * Description, July 1998) — big-endian file/record headers, little-
  * endian geometry, type-5 Polygon records with Parts offsets and closed
  * rings — and both directions are byte-complete, so any GIS reader
  * opens the output and any spec-conformant .shp parses back.
  *
  * Scope: geometry only (shape type 5). The sidecar .dbf attribute table
  * and .shx index are out of scope — the reference reads geometry +
  * attributes through geopandas, and the engine models attributes as
  * ordinary table columns joined by record number. Coordinates are raw
  * IEEE float64, so round trips are bit-exact (no quantization step,
  * unlike LAS).
  *
  * Distribution shape: one complete shapefile per TILE (the same
  * byte-slice unit as [[Laz]] chunks / [[Las]] tiles) — encode gathers a
  * tile's polygons, decode is a pure function of one tile's bytes, so a
  * directory of per-tile .shp files fans out embarrassingly.
  */
object Shp {

  private val FileCode = 9994
  private val Version = 1000
  private val PolygonType = 5

  /** One polygon: (polyId, rings); each ring is its ordered vertex list
    * WITHOUT the closing vertex — [[encode]] appends the spec-required
    * copy of the first vertex to close every ring. */
  type Poly = (Long, Array[Array[(Double, Double)]])

  /** Assemble a complete .shp from polygons (records are numbered 1..n
    * in the given order). */
  def encode(polys: Seq[Poly]): Array[Byte] = {
    require(polys.nonEmpty, "shapefile needs at least one polygon")
    val closed = polys.map { case (id, rings) =>
      require(rings.nonEmpty && rings.forall(_.length >= 3),
        s"polygon $id: every ring needs >= 3 vertices")
      (id, rings.map(r => r :+ r.head))
    }
    val contentBytes = closed.map { case (_, rings) =>
      val np = rings.map(_.length).sum
      4 + 32 + 4 + 4 + 4 * rings.length + 16 * np
    }
    val total = 100 + contentBytes.map(_ + 8).sum
    val b = ByteBuffer.allocate(total)
    // --- 100-byte header: BE magic/length, LE version/type/bbox
    b.order(ByteOrder.BIG_ENDIAN)
    b.putInt(FileCode)
    (0 until 5).foreach(_ => b.putInt(0))
    b.putInt(total / 2) // file length in 16-bit words
    b.order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(Version)
    b.putInt(PolygonType)
    val all = closed.flatMap(_._2.iterator.flatMap(_.iterator))
    b.putDouble(all.map(_._1).min).putDouble(all.map(_._2).min)
    b.putDouble(all.map(_._1).max).putDouble(all.map(_._2).max)
    (0 until 4).foreach(_ => b.putDouble(0.0)) // Z/M ranges unused
    // --- records
    closed.zipWithIndex.foreach { case ((_, rings), idx) =>
      b.order(ByteOrder.BIG_ENDIAN)
      b.putInt(idx + 1) // record numbers are 1-based
      b.putInt(contentBytes(idx) / 2)
      b.order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(PolygonType)
      val pts = rings.iterator.flatMap(_.iterator).toArray
      b.putDouble(pts.map(_._1).min).putDouble(pts.map(_._2).min)
      b.putDouble(pts.map(_._1).max).putDouble(pts.map(_._2).max)
      b.putInt(rings.length)
      b.putInt(pts.length)
      rings.scanLeft(0)(_ + _.length).init.foreach(b.putInt)
      pts.foreach { case (x, y) => b.putDouble(x).putDouble(y) }
    }
    b.array()
  }

  /** Parse a .shp back to vertices: (recNo, partIdx, pointIdx, x, y).
    * pointIdx is ring-local and INCLUDES the closing vertex. Junk,
    * truncation, and non-polygon shape types throw. */
  def decode(bytes: Array[Byte]): Array[(Int, Int, Int, Double, Double)] = {
    require(bytes.length >= 100, "not a shapefile: shorter than the header")
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(be.getInt(0) == FileCode, "not a shapefile: bad file code")
    require(le.getInt(28) == Version, "unsupported shapefile version")
    require(le.getInt(32) == PolygonType,
      s"only Polygon (type 5) supported, got ${le.getInt(32)}")
    require(be.getInt(24).toLong * 2 == bytes.length,
      "file length field disagrees with byte count")
    val out = Array.newBuilder[(Int, Int, Int, Double, Double)]
    var off = 100
    while (off < bytes.length) {
      require(off + 8 <= bytes.length, "truncated record header")
      val recNo = be.getInt(off)
      val clen64 = be.getInt(off + 4).toLong * 2
      require(clen64 >= 44 && off.toLong + 8 + clen64 <= bytes.length,
        s"record $recNo: corrupt content length $clen64")
      val clen = clen64.toInt
      val c = off + 8
      require(le.getInt(c) == PolygonType, s"record $recNo: not a polygon")
      val numParts = le.getInt(c + 36)
      val numPoints = le.getInt(c + 40)
      // Long math: flipped counts near Int.MaxValue must fail here, not
      // overflow into a colliding content length and index out of bounds
      require(numParts > 0 && numPoints >= numParts.toLong * 3,
        s"record $recNo: corrupt part/point counts")
      require(clen.toLong == 44L + 4L * numParts + 16L * numPoints,
        s"record $recNo: content length does not match counts")
      val starts = Array.tabulate(numParts)(p => le.getInt(c + 44 + 4 * p))
      val ptBase = c + 44 + 4 * numParts
      var part = 0
      while (part < numParts) {
        val end = if (part + 1 < numParts) starts(part + 1) else numPoints
        require(starts(part) >= 0 && end > starts(part) && end <= numPoints,
          s"record $recNo: corrupt Parts offsets")
        var i = starts(part)
        while (i < end) {
          out += ((recNo, part, i - starts(part),
            le.getDouble(ptBase + 16 * i), le.getDouble(ptBase + 16 * i + 8)))
          i += 1
        }
        part += 1
      }
      off += 8 + clen
    }
    out.result()
  }

  /** Tile-parallel decode boundary (the [[Las.tilesToPoints]] shape):
    * each row of `tiles` is (tile_id, one complete shapefile's bytes);
    * every tile decodes independently in executors. */
  def tilesToRings(tiles: DataFrame): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles.select(col("tile_id").cast("int"), col("data"))
      .as[(Int, Array[Byte])]
      .flatMap { case (id, data) =>
        decode(data).iterator.map { case (rec, part, idx, x, y) =>
          (id, rec, part, idx, x, y)
        }
      }
      .toDF("tile_id", "rec_no", "part_idx", "pt_idx", "x", "y")
  }
}
