package graft.ingest

import java.nio.ByteBuffer

/** Pure-JVM PNG codec (public W3C/ISO PNG spec; zlib via [[Zlib]], the
  * JDK's java.util.zip). Closes the "compressed image codec" gap of the
  * multimodal/raster ingest story the same way [[GeoTiff]]/[[Lzw]] did
  * for TIFF: a byte codec that is a pure function over arrays, usable
  * tile-parallel with no native libraries.
  *
  * Scope (validated, everything else rejected loudly):
  *   - color type 0 (grayscale) and 2 (truecolor RGB)
  *   - bit depth 8 or 16 (16 is big-endian per spec)
  *   - interlace 0 only; all five scanline filters on decode
  *     (None/Sub/Up/Average/Paeth); CRC32 of every chunk verified
  *   - encoder emits Sub on the first row and Up on the rest — real
  *     filters, so any conformant reader (e.g. the JDK's ImageIO, which
  *     PngSpec cross-validates against both directions) exercises the
  *     same defilter math the decoder implements
  *
  * Samples are returned row-major as `samples(row)(col*channels + ch)`,
  * each an unsigned Int (0..255 or 0..65535).
  */
object Png {

  private val SIG = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  private def crc32(typ: String, data: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32()
    c.update(typ.getBytes("US-ASCII"))
    c.update(data)
    c.getValue.toInt
  }

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
                    data: Array[Byte]): Unit = {
    val b = ByteBuffer.allocate(12 + data.length)
    b.putInt(data.length)
    b.put(typ.getBytes("US-ASCII"))
    b.put(data)
    b.putInt(crc32(typ, data))
    out.write(b.array())
  }

  /** Encode `samples(row)(col*channels+ch)` (unsigned, fitting `depth`
    * bits) as a non-interlaced PNG. `channels` 1 → gray, 3 → RGB. */
  def encode(width: Int, height: Int, depth: Int, channels: Int,
             samples: Array[Array[Int]]): Array[Byte] = {
    require(width > 0 && height > 0, "PNG dims must be positive")
    require(depth == 8 || depth == 16, s"bit depth 8 or 16, got $depth")
    require(channels == 1 || channels == 3, s"1 or 3 channels, got $channels")
    require(samples.length == height, s"expected $height rows")
    val colorType = if (channels == 1) 0 else 2
    val bpp = depth / 8 * channels          // filter unit, bytes per pixel
    val stride = bpp * width
    val maxv = if (depth == 8) 0xff else 0xffff

    // raw scanlines
    val lines = samples.map { r =>
      require(r.length == width * channels, "row sample count mismatch")
      val a = new Array[Byte](stride)
      var i = 0
      while (i < r.length) {
        val v = r(i)
        require(v >= 0 && v <= maxv, s"sample $v out of $depth-bit range")
        if (depth == 8) a(i) = v.toByte
        else { a(2 * i) = (v >>> 8).toByte; a(2 * i + 1) = v.toByte }
        i += 1
      }
      a
    }
    // filter: Sub (1) on row 0, Up (2) after — lossless, spec-standard
    val raw = new Array[Byte]((stride + 1) * height)
    var r = 0
    while (r < height) {
      val base = r * (stride + 1)
      val cur = lines(r)
      if (r == 0) {
        raw(base) = 1
        var i = 0
        while (i < stride) {
          val left = if (i >= bpp) cur(i - bpp) & 0xff else 0
          raw(base + 1 + i) = ((cur(i) & 0xff) - left).toByte
          i += 1
        }
      } else {
        raw(base) = 2
        val up = lines(r - 1)
        var i = 0
        while (i < stride) {
          raw(base + 1 + i) = ((cur(i) & 0xff) - (up(i) & 0xff)).toByte
          i += 1
        }
      }
      r += 1
    }

    val out = new java.io.ByteArrayOutputStream(64 + raw.length / 2)
    out.write(SIG)
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
    ihdr.put(depth.toByte).put(colorType.toByte)
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
    chunk(out, "IHDR", ihdr.array())
    chunk(out, "IDAT", Zlib.deflate(raw))
    chunk(out, "IEND", Array.empty)
    out.toByteArray
  }

  /** Decode a PNG produced by any conformant writer (subset above).
    * Returns (width, height, depth, channels, samples). */
  def decode(bytes: Array[Byte]): (Int, Int, Int, Int, Array[Array[Int]]) = {
    require(bytes.length > 8 && SIG.indices.forall(i => bytes(i) == SIG(i)),
      "not a PNG")
    val b = ByteBuffer.wrap(bytes)
    b.position(8)
    var width = -1; var height = -1; var depth = -1; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var seenEnd = false
    while (!seenEnd) {
      require(b.remaining() >= 12, "truncated PNG chunk")
      val len = b.getInt
      require(len >= 0 && b.remaining() >= len + 8,
        s"corrupt PNG chunk length $len")
      val typ = {
        val t = new Array[Byte](4); b.get(t); new String(t, "US-ASCII")
      }
      val data = new Array[Byte](len)
      b.get(data)
      val crc = b.getInt
      require(crc == crc32(typ, data), s"PNG CRC mismatch in $typ")
      typ match {
        case "IHDR" =>
          val h = ByteBuffer.wrap(data)
          width = h.getInt; height = h.getInt
          depth = h.get() & 0xff; colorType = h.get() & 0xff
          require(h.get() == 0 && h.get() == 0, "bad compression/filter method")
          require(h.get() == 0, "interlaced PNG not supported")
          require(depth == 8 || depth == 16, s"bit depth $depth not supported")
          require(colorType == 0 || colorType == 2,
            s"color type $colorType not supported")
        case "IDAT" => idat.write(data)
        case "IEND" => seenEnd = true
        case _ => () // ancillary chunks (tEXt, pHYs, …) are skippable
      }
    }
    require(width > 0 && height > 0, "missing IHDR")
    val channels = if (colorType == 0) 1 else 3
    val bpp = depth / 8 * channels
    // size math in Long before any Int allocation: adversarial IHDR dims
    // (e.g. 2^28 × 2^28) overflow Int stride*height to a negative/wrapped
    // size and surface as NegativeArraySizeException instead of a clean
    // rejection
    val need = (bpp.toLong * width + 1L) * height
    require(need <= Int.MaxValue && width.toLong * height <= (1L << 30),
      s"PNG dims ${width}x$height (bpp $bpp) exceed supported size")
    val stride = bpp * width
    val raw = Zlib.inflate(idat.toByteArray, (stride + 1) * height)

    // defilter in place, then unpack
    val prev = new Array[Byte](stride)
    val cur = new Array[Byte](stride)
    val outRows = Array.ofDim[Array[Int]](height)
    var r = 0
    while (r < height) {
      val base = r * (stride + 1)
      val ft = raw(base) & 0xff
      var i = 0
      while (i < stride) {
        val x = raw(base + 1 + i) & 0xff
        val a = if (i >= bpp) cur(i - bpp) & 0xff else 0   // left
        val bu = prev(i) & 0xff                            // up
        val c = if (i >= bpp) prev(i - bpp) & 0xff else 0  // upper-left
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + bu
          case 3 => x + (a + bu) / 2
          case 4 => // Paeth predictor
            val p = a + bu - c
            val pa = math.abs(p - a); val pb = math.abs(p - bu)
            val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) bu else c)
          case _ => throw new IllegalArgumentException(s"bad filter type $ft")
        }
        cur(i) = v.toByte
        i += 1
      }
      val row = new Array[Int](width * channels)
      var j = 0
      while (j < row.length) {
        row(j) =
          if (depth == 8) cur(j) & 0xff
          else ((cur(2 * j) & 0xff) << 8) | (cur(2 * j + 1) & 0xff)
        j += 1
      }
      outRows(r) = row
      System.arraycopy(cur, 0, prev, 0, stride)
      r += 1
    }
    (width, height, depth, channels, outRows)
  }
}
