package graft.geom

import java.nio.{ByteBuffer, ByteOrder}

/** Well-Known Binary (WKB) polygon codec — the binary geometry
  * representation of GeoParquet / GeoPackage / PostGIS (OGC 06-103r4
  * §8), i.e. how a lakehouse-scale Spark engine actually carries
  * geometry: one `binary` column beside ordinary attributes, codec
  * applied in-row. Complements the file-level vector sources
  * (`ingest.Shp` for .shp, the GeoJSON Feature gate) with the COLUMN
  * form the reference's geopandas frames serialize to when written to
  * parquet (`_read_polygon_file` → GeoDataFrame → to_parquet).
  *
  * Scope: Polygon (type 3) and MultiPolygon (type 6), both byte orders
  * on decode, little-endian on encode (the GeoParquet default).
  * Coordinates are raw IEEE float64 — round trips are bit-exact.
  */
object Wkb {

  /** rings → little-endian WKB Polygon. Rings are used as given
    * (callers close them; WKB itself does not mandate dedup). */
  def encodePolygon(rings: Array[Array[(Double, Double)]]): Array[Byte] = {
    require(rings.nonEmpty, "polygon needs at least one ring")
    val n = 1 + 4 + 4 + rings.map(r => 4 + 16 * r.length).sum
    val b = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte) // NDR (little-endian)
    b.putInt(3)     // Polygon
    b.putInt(rings.length)
    rings.foreach { r =>
      b.putInt(r.length)
      r.foreach { case (x, y) => b.putDouble(x).putDouble(y) }
    }
    b.array()
  }

  /** polygons → little-endian WKB MultiPolygon (each member a complete
    * nested WKB Polygon with its own byte-order marker, per spec). */
  def encodeMultiPolygon(polys: Array[Array[Array[(Double, Double)]]]): Array[Byte] = {
    val members = polys.map(encodePolygon)
    val b = ByteBuffer.allocate(1 + 4 + 4 + members.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte)
    b.putInt(6) // MultiPolygon
    b.putInt(polys.length)
    members.foreach(b.put)
    b.array()
  }

  /** WKB (Polygon or MultiPolygon, either byte order) → flat vertices
    * (polyIdx, ringIdx, pointIdx, x, y). Junk and truncation throw. */
  def decode(bytes: Array[Byte]): Array[(Int, Int, Int, Double, Double)] = {
    val out = Array.newBuilder[(Int, Int, Int, Double, Double)]
    val end = decodeGeom(bytes, 0, 0, out)
    require(end == bytes.length, s"trailing bytes after geometry at $end")
    out.result()
  }

  private def decodeGeom(bytes: Array[Byte], start: Int, polyIdx: Int,
      out: scala.collection.mutable.Builder[(Int, Int, Int, Double, Double),
        Array[(Int, Int, Int, Double, Double)]]): Int = {
    // +9, not +5: both geometry branches read the 4-byte ring/member count
    // at start+5, so a buffer truncated inside that count must reject here
    // (not via a raw ByteBuffer IndexOutOfBounds)
    require(start + 9 <= bytes.length, "truncated WKB header")
    val order = bytes(start)
    require(order == 0 || order == 1, s"bad WKB byte-order marker $order")
    val b = ByteBuffer.wrap(bytes).order(
      if (order == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    b.getInt(start + 1) match {
      case 3 =>
        val nRings = b.getInt(start + 5)
        require(nRings > 0, "polygon with no rings")
        var off = start + 9
        var ri = 0
        while (ri < nRings) {
          require(off + 4 <= bytes.length, "truncated ring header")
          val np = b.getInt(off)
          require(np >= 0 && off + 4 + 16L * np <= bytes.length,
            s"ring $ri: corrupt point count $np")
          var pi = 0
          while (pi < np) {
            out += ((polyIdx, ri, pi,
              b.getDouble(off + 4 + 16 * pi), b.getDouble(off + 12 + 16 * pi)))
            pi += 1
          }
          off += 4 + 16 * np
          ri += 1
        }
        off
      case 6 =>
        val nPolys = b.getInt(start + 5)
        require(nPolys >= 0, "corrupt multipolygon count")
        var off = start + 9
        var pi = 0
        while (pi < nPolys) {
          off = decodeGeom(bytes, off, polyIdx + pi, out)
          pi += 1
        }
        off
      case t => throw new IllegalArgumentException(
        s"unsupported WKB geometry type $t (Polygon=3 / MultiPolygon=6 only)")
    }
  }
}
