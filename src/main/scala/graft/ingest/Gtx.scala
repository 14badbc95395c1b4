package graft.ingest

/** Pure-JVM NOAA/VDatum `.gtx` vertical-datum grid codec — the geoid
  * grid-FILE format the reference's `_GEOID_MAP` points most CONUS/AK/HI
  * datums at (differencing_functions.py:2145–2156) and the PROJ
  * vertical-shift grid format (public spec: PROJ gridshift docs /
  * vdatum.noaa.gov; also readable by GDAL as the "NOAA .gtx" driver).
  *
  * Layout (all BIG-endian):
  *   40-byte header — llLat f64, llLon f64 (grid origin = LOWER-LEFT /
  *   south-west node), dLat f64, dLon f64 (node spacing, degrees),
  *   nRows i32, nCols i32 — then nRows×nCols float32 undulation values
  *   in metres, row-major starting at the SOUTH row and walking north.
  *
  * Pure functions over byte arrays → tile-parallel, exactly like
  * [[Npy]]/[[GeoTiff]]/[[Las]]. Corrupt input throws
  * IllegalArgumentException by name, never a raw buffer error.
  */
object Gtx {

  /** Grid origin is the south-west node; row r, col c sits at
    * (llLat + r*dLat, llLon + c*dLon). */
  final case class Header(llLat: Double, llLon: Double,
                          dLat: Double, dLon: Double,
                          nRows: Int, nCols: Int)

  /** Encode a grid; `rows(0)` is the SOUTHERNMOST row (GTX order). */
  def encode(h: Header, rows: Array[Array[Float]]): Array[Byte] = {
    require(h.nRows == rows.length, s"nRows ${h.nRows} != ${rows.length}")
    require(rows.forall(_.length == h.nCols), "ragged grid")
    require(h.dLat > 0 && h.dLon > 0, "non-positive node spacing")
    val b = java.nio.ByteBuffer.allocate(40 + 4 * h.nRows * h.nCols)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    b.putDouble(h.llLat).putDouble(h.llLon)
    b.putDouble(h.dLat).putDouble(h.dLon)
    b.putInt(h.nRows).putInt(h.nCols)
    rows.foreach(_.foreach(b.putFloat))
    b.array()
  }

  /** Decode; returns the header and the grid widened to Double
    * (f32 widens exactly), `rows(0)` = southernmost row. */
  def decode(bytes: Array[Byte]): (Header, Array[Array[Double]]) = {
    require(bytes.length >= 40, s"not a GTX file (${bytes.length} bytes)")
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
    val h = Header(b.getDouble(0), b.getDouble(8), b.getDouble(16),
      b.getDouble(24), b.getInt(32), b.getInt(36))
    // upper bound BEFORE the size product: two ~2^31 dims overflow even
    // 64-bit 4·nRows·nCols (real geoid grids are a few thousand a side)
    require(h.nRows > 0 && h.nCols > 0 &&
      h.nRows <= 1000000 && h.nCols <= 1000000,
      s"GTX grid dims ${h.nRows}x${h.nCols} outside (0, 1e6]")
    require(h.dLat > 0 && h.dLon > 0,
      s"GTX node spacing ${h.dLat}/${h.dLon} not positive")
    require(h.llLat >= -90.0 && h.llLat <= 90.0,
      s"GTX origin latitude ${h.llLat} outside [-90, 90]")
    // Long math before any Int allocation (the Png overflow lesson)
    val need = 40L + 4L * h.nRows * h.nCols
    require(need == bytes.length,
      s"GTX payload ${bytes.length} bytes != expected $need " +
        s"for ${h.nRows}x${h.nCols}")
    val grid = Array.tabulate(h.nRows, h.nCols) { (r, c) =>
      b.getFloat(40 + 4 * (r * h.nCols + c)).toDouble
    }
    (h, grid)
  }

  /** Bilinear undulation sample at (lat, lon) — the PROJ/VDatum grid
    * interpolation rule. Fixed 4-term expression order (the
    * regridBilinear determinism rule). Outside the grid hull throws. */
  def undulationAt(h: Header, grid: Array[Array[Double]],
                   lat: Double, lon: Double): Double = {
    require(h.nRows >= 2 && h.nCols >= 2, "degenerate grid (needs 2x2 nodes)")
    // epsilon-tolerant hull check then clamp: (lat-llLat)/dLat for a point
    // exactly on the last node can land a few ulps past nRows-1
    val eps = 1e-9
    val gy0 = (lat - h.llLat) / h.dLat
    val gx0 = (lon - h.llLon) / h.dLon
    require(gy0 >= -eps && gy0 <= h.nRows - 1 + eps &&
      gx0 >= -eps && gx0 <= h.nCols - 1 + eps,
      s"($lat, $lon) outside GTX grid")
    val gy = math.min(math.max(gy0, 0.0), (h.nRows - 1).toDouble)
    val gx = math.min(math.max(gx0, 0.0), (h.nCols - 1).toDouble)
    val r0 = math.min(gy.toInt, h.nRows - 2)
    val c0 = math.min(gx.toInt, h.nCols - 2)
    val fy = gy - r0
    val fx = gx - c0
    (1.0 - fx) * (1.0 - fy) * grid(r0)(c0) +
      fx * (1.0 - fy) * grid(r0)(c0 + 1) +
      (1.0 - fx) * fy * grid(r0 + 1)(c0) +
      fx * fy * grid(r0 + 1)(c0 + 1)
  }
}
