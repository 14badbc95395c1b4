package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal PURE-JVM LAS 1.2 point-cloud codec — the byte boundary the
  * reference hands to PDAL pipelines (`differencing_functions.py:738–828`).
  * Covers point data record formats 0 and 1 (X/Y/Z scaled int32 +
  * classification; format 1 appends the 8-byte double GPS time), which
  * carry every dimension the reference's crop/noise/ground/grid
  * workflow touches.
  *
  * Coordinates are stored LAS-style as `round(v / scale)` int32 with the
  * scale/offset recorded in the header; the writer uses scale 1e-6 and
  * offset 0, so any 6-decimal canonical value round-trips EXACTLY and the
  * decode expression (`X * 1e-6`) is one deterministic IEEE multiply that
  * an oracle can replicate verbatim.
  *
  * Like [[GeoTiff]], `encode`/`decode` are pure per-tile byte functions:
  * a 100-TB ingest is a (tile_id, bytes) table flat-mapped tile-parallel
  * into the point model ([[tilesToPoints]]).
  */
object Las {

  private val HEADER_SIZE = 227
  private val POINT_LEN = 20
  val Scale = 1e-6

  /** (x, y, z, classification) points → LAS 1.2 format-0 bytes. */
  def encode(points: Array[(Double, Double, Double, Int)]): Array[Byte] =
    encodeImpl(points.map(p => (p._1, p._2, p._3, p._4, 0.0)), fmt = 0)

  /** (x, y, z, classification, gps_time) points → LAS 1.2 format-1 bytes
    * (format 0 + the 8-byte IEEE double GPS time — bit-exact through the
    * round trip, no quantization). */
  def encodeTimed(points: Array[(Double, Double, Double, Int, Double)]): Array[Byte] =
    encodeImpl(points, fmt = 1)

  private def encodeImpl(points: Array[(Double, Double, Double, Int, Double)],
                         fmt: Int): Array[Byte] = {
    val n = points.length
    val recLen = if (fmt == 1) POINT_LEN + 8 else POINT_LEN
    val b = ByteBuffer.allocate(HEADER_SIZE + recLen * n)
      .order(ByteOrder.LITTLE_ENDIAN)
    def quant(v: Double): Int = {
      val q = math.floor(v / Scale + 0.5)
      require(q >= Int.MinValue && q <= Int.MaxValue,
        s"coordinate $v overflows int32 at scale $Scale")
      q.toInt
    }
    b.put("LASF".getBytes("US-ASCII")) // 0: file signature
    b.putShort(0.toShort) // 4: file source id
    b.putShort(0.toShort) // 6: global encoding
    b.position(24)
    b.put(1.toByte).put(2.toByte) // version 1.2
    b.position(94)
    b.putShort(HEADER_SIZE.toShort) // header size
    b.putInt(HEADER_SIZE) // offset to point data
    b.putInt(0) // number of VLRs
    b.put(fmt.toByte) // point data format
    b.putShort(recLen.toShort)
    b.putInt(n)
    b.position(131)
    b.putDouble(Scale).putDouble(Scale).putDouble(Scale)
    b.putDouble(0.0).putDouble(0.0).putDouble(0.0) // x/y/z offset
    def minMax(f: ((Double, Double, Double, Int, Double)) => Double): (Double, Double) =
      if (n == 0) (0.0, 0.0)
      else (points.map(f).max, points.map(f).min)
    val (xmax, xmin) = minMax(_._1)
    val (ymax, ymin) = minMax(_._2)
    val (zmax, zmin) = minMax(_._3)
    b.putDouble(xmax).putDouble(xmin).putDouble(ymax)
      .putDouble(ymin).putDouble(zmax).putDouble(zmin)
    b.position(HEADER_SIZE)
    points.foreach { case (x, y, z, cls, t) =>
      b.putInt(quant(x)).putInt(quant(y)).putInt(quant(z))
      b.putShort(0.toShort) // intensity
      b.put(0x11.toByte) // return 1 of 1
      b.put(cls.toByte)
      b.put(0.toByte).put(0.toByte).putShort(0.toShort) // angle/user/source
      if (fmt == 1) b.putDouble(t)
    }
    b.array()
  }

  /** LAS bytes → (x, y, z, classification) points. Accepts any LAS 1.x
    * with point format 0/1 (format 1 appends GPS time, which is skipped);
    * scale/offset honored from the header. */
  def decode(bytes: Array[Byte]): Array[(Double, Double, Double, Int)] =
    decodeTimed(bytes).map(p => (p._1, p._2, p._3, p._4))

  /** Like [[decode]] but keeps the GPS time channel: format-1 records
    * yield their stored double, format-0 records yield 0.0. */
  def decodeTimed(bytes: Array[Byte]): Array[(Double, Double, Double, Int, Double)] = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= HEADER_SIZE &&
      new String(bytes, 0, 4, "US-ASCII") == "LASF", "not a LAS file")
    val fmt = b.get(104) & 0xff
    require(fmt == 0 || fmt == 1, s"only point formats 0/1 supported, got $fmt")
    val dataOff = b.getInt(96)
    val recLen = b.getShort(105) & 0xffff
    val n = b.getInt(107)
    val sx = b.getDouble(131); val sy = b.getDouble(139); val sz = b.getDouble(147)
    val ox = b.getDouble(155); val oy = b.getDouble(163); val oz = b.getDouble(171)
    Array.tabulate(n) { i =>
      val p = dataOff + i * recLen
      (b.getInt(p) * sx + ox,
        b.getInt(p + 4) * sy + oy,
        b.getInt(p + 8) * sz + oz,
        bytes(p + 15) & 0xff,
        if (fmt == 1) b.getDouble(p + 20) else 0.0)
    }
  }

  /** Distributed ingest boundary: `[tile_id:int, data:binary]` LAS tiles →
    * point table `[tile_id, x, y, z, classification]`, decoded
    * tile-parallel. */
  def tilesToPoints(tiles: DataFrame): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles.select(col("tile_id").cast("int"), col("data"))
      .as[(Int, Array[Byte])]
      .flatMap { case (id, data) =>
        decode(data).iterator.map { case (x, y, z, c) => (id, x, y, z, c) }
      }
      .toDF("tile_id", "x", "y", "z", "classification")
  }

  /** Format-1 ingest boundary: also surfaces the GPS time channel. */
  def tilesToPointsTimed(tiles: DataFrame): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles.select(col("tile_id").cast("int"), col("data"))
      .as[(Int, Array[Byte])]
      .flatMap { case (id, data) =>
        decodeTimed(data).iterator.map { case (x, y, z, c, t) => (id, x, y, z, c, t) }
      }
      .toDF("tile_id", "x", "y", "z", "classification", "gps_time")
  }
}
