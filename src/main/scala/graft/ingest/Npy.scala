package graft.ingest

/** Pure-JVM NumPy `.npy` v1.0 codec (public format spec, numpy/format.py)
  * for 2-D little-endian float arrays — the de-facto interchange format
  * for embedding matrices in NumPy-centric pipelines (the reference
  * itself is NumPy end to end). Magic `\x93NUMPY`, version 1.0, u16
  * header length, then a Python-dict header padded with spaces so data
  * starts 64-byte aligned, then raw C-order samples.
  *
  * Pure functions over byte arrays → one matrix per tile, tile-parallel,
  * exactly like [[GeoTiff]]/[[Shp]]/[[Las]].
  */
object Npy {

  private val Magic = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y')

  /** Encode an n×d float32 matrix (descr `<f4`, C order). */
  def encodeF32(rows: Array[Array[Float]]): Array[Byte] = {
    val n = rows.length
    val d = if (n == 0) 0 else rows(0).length
    rows.foreach(r => require(r.length == d, "ragged matrix"))
    val dict = s"{'descr': '<f4', 'fortran_order': False, 'shape': ($n, $d), }"
    // total header (magic 6 + version 2 + len 2 + dict + padding) is a
    // multiple of 64, padding = spaces, final byte a newline (spec)
    val base = 10 + dict.length + 1
    val padded = (base + 63) / 64 * 64
    val hlen = padded - 10
    val b = java.nio.ByteBuffer.allocate(padded + 4 * n * d)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(Magic).put(1.toByte).put(0.toByte)
    b.putShort(hlen.toShort)
    b.put(dict.getBytes("US-ASCII"))
    for (_ <- 0 until (hlen - dict.length - 1)) b.put(' '.toByte)
    b.put('\n'.toByte)
    rows.foreach(_.foreach(b.putFloat))
    b.array()
  }

  /** Decode every member of an `.npz` archive (np.savez /
    * np.savez_compressed — a zip of `.npy` members, stored or deflated;
    * the JDK zip reader handles both). Returns member name (without the
    * `.npy` suffix) → decoded matrix. */
  def decodeNpz(bytes: Array[Byte]): Map[String, (Int, Int, Array[Array[Double]])] = {
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = scala.collection.mutable.Map
      .empty[String, (Int, Int, Array[Array[Double]])]
    var e = zin.getNextEntry
    require(e != null, "not an NPZ archive (no zip entries)")
    while (e != null) {
      val name = e.getName.stripSuffix(".npy")
      out(name) = decode(zin.readAllBytes())
      e = zin.getNextEntry
    }
    out.toMap
  }

  /** Decode a v1.0/2.0 `.npy` holding a 2-D `<f4` or `<f8` C-order
    * array. Returns (n, d, row-major doubles — f32 widened exactly). */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Array[Double]]) = {
    require(bytes.length >= 12 && Magic.indices.forall(i => bytes(i) == Magic(i)),
      "not an NPY file (bad magic)")
    val major = bytes(6) & 0xff
    require(major == 1 || major == 2, s"unsupported NPY version $major")
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val (hlen, hoff) =
      if (major == 1) ((b.getShort(8) & 0xffff, 10))
      else ((b.getInt(8), 12))
    require(hoff + hlen <= bytes.length, "truncated NPY header")
    val header = new String(bytes, hoff, hlen, "US-ASCII")
    def field(re: scala.util.matching.Regex): String =
      re.findFirstMatchIn(header)
        .getOrElse(throw new IllegalArgumentException(
          s"NPY header missing field: $re")).group(1)
    val descr = field("'descr':\\s*'([^']+)'".r)
    require(descr == "<f4" || descr == "<f8",
      s"only little-endian float NPY supported, got '$descr'")
    require(field("'fortran_order':\\s*(True|False)".r) == "False",
      "fortran_order NPY unsupported")
    val shape = field("'shape':\\s*\\(([^)]*)\\)".r)
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt)
    require(shape.length == 2, s"only 2-D NPY supported, got ${shape.length}-D")
    val Array(n, d) = shape
    val px = if (descr == "<f4") 4 else 8
    val dataOff = hoff + hlen
    require(dataOff + px.toLong * n * d <= bytes.length, "truncated NPY data")
    val out = Array.tabulate(n, d) { (i, j) =>
      val at = dataOff + px * (i.toLong * d + j).toInt
      if (px == 4) b.getFloat(at).toDouble else b.getDouble(at)
    }
    (n, d, out)
  }
}
