package graft.ingest

/** Pure-JVM baseline JPEG codec (public ITU-T T.81 / JFIF spec) — the
  * "deep codec" the multimodal pipeline stubbed through round 6. Encoder
  * writes baseline sequential DCT (SOI/APP0/DQT/SOF0/DHT/SOS/EOI) with
  * the Annex K quantization + Huffman tables, grayscale or YCbCr 4:4:4;
  * the decoder reads any baseline stream with sampling factors up to
  * 2×2 (so ImageIO/libjpeg's default 4:2:0 output decodes too) and
  * restart markers.
  *
  * Lossy-codec honesty: JPEG decode is NOT bit-identical across
  * implementations (T.81 only bounds IDCT error), so the oracle gate
  * (`i_jpeg_decode`) checks exact structural fields (dims, component
  * count) plus a reconstruction-error bound against the source pixels,
  * while JpegSpec pins cross-implementation conformance against the
  * JDK's ImageIO plugin in both directions within a small tolerance.
  *
  * Pure functions over byte arrays → usable tile-parallel in
  * mapPartitions exactly like [[GeoTiff]]/[[Png]]/[[Las]].
  */
object Jpeg {

  // ---- tables (T.81 Annex K) ------------------------------------------

  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val stdLumQ: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99)

  private val stdChrQ: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99)

  // (bits per code length 1..16, symbol values)
  private val dcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcLumVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val dcChrBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val dcChrVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val acLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val acLumVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val acChrBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val acChrVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** (code, length) per symbol, built per T.81 C.2 canonical order. */
  private def buildEncTable(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    for (len <- 1 to 16) {
      for (_ <- 0 until bits(len)) {
        table(vals(k)) = (code, len)
        code += 1
        k += 1
      }
      code <<= 1
    }
    table
  }

  private lazy val dcLumEnc = buildEncTable(dcLumBits, dcLumVals)
  private lazy val acLumEnc = buildEncTable(acLumBits, acLumVals)
  private lazy val dcChrEnc = buildEncTable(dcChrBits, dcChrVals)
  private lazy val acChrEnc = buildEncTable(acChrBits, acChrVals)

  private def scaledQ(base: Array[Int], quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, s"quality 1..100, got $quality")
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    base.map(v => math.min(255, math.max(1, (v * scale + 50) / 100)))
  }

  // ---- bit I/O --------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1s per spec
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc)
      if (acc == 0xff) out.write(0x00)
      acc = 0; nbits = 0
    }
  }

  // ---- forward DCT (double-precision separable DCT-II) ----------------

  private lazy val dctCos: Array[Array[Double]] =
    Array.tabulate(8, 8)((u, x) => math.cos((2 * x + 1) * u * math.Pi / 16.0))

  private def fdct(block: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += block(y * 8 + x) * dctCos(u)(x); x += 1 }
        tmp(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    var v = 0
    while (v < 8) { // cols
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * dctCos(v)(yy); yy += 1 }
        val cu = if (u == 0) math.sqrt(0.5) else 1.0
        val cv = if (v == 0) math.sqrt(0.5) else 1.0
        out(v * 8 + u) = 0.25 * cu * cv * s
        u += 1
      }
      v += 1
    }
    out
  }

  private def idct(coef: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) { // rows of coef → spatial x
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) math.sqrt(0.5) else 1.0
          s += cu * coef(v * 8 + u) * dctCos(u)(x)
          u += 1
        }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) {
          val cv = if (vv == 0) math.sqrt(0.5) else 1.0
          s += cv * tmp(vv * 8 + x) * dctCos(vv)(y)
          vv += 1
        }
        out(y * 8 + x) = 0.25 * s
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- encoder --------------------------------------------------------

  private def csize(v: Int): Int = { // bit category of a DC diff / AC value
    var a = math.abs(v)
    var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  private def encodeBlock(bw: BitWriter, samples: Array[Double], q: Array[Int],
                          dcTab: Array[(Int, Int)], acTab: Array[(Int, Int)],
                          prevDc: Int): Int = {
    val f = fdct(samples)
    val zz = new Array[Int](64)
    var i = 0
    while (i < 64) {
      val nat = zigzag(i)
      val qv = q(i) // quant tables are stored in zigzag order
      zz(i) = math.round(f(nat) / qv).toInt
      i += 1
    }
    val diff = zz(0) - prevDc
    val s = csize(diff)
    val (dcode, dlen) = dcTab(s)
    bw.put(dcode, dlen)
    if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    var run = 0
    var k = 1
    while (k < 64) {
      if (zz(k) == 0) run += 1
      else {
        while (run >= 16) {
          val (zc, zl) = acTab(0xf0); bw.put(zc, zl); run -= 16
        }
        val sz = csize(zz(k))
        val (ac, al) = acTab((run << 4) | sz)
        bw.put(ac, al)
        bw.put(if (zz(k) < 0) zz(k) + (1 << sz) - 1 else zz(k), sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (ec, el) = acTab(0x00); bw.put(ec, el) }
    zz(0)
  }

  private def writeMarkers(out: java.io.ByteArrayOutputStream, w: Int, h: Int,
                           gray: Boolean, qLum: Array[Int], qChr: Array[Int]): Unit = {
    def u16(v: Int): Unit = { out.write(v >>> 8); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0 JFIF
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1) // version 1.1
    out.write(0); u16(1); u16(1) // no density units, 1:1
    out.write(0); out.write(0) // no thumbnail
    def dqt(id: Int, q: Array[Int]): Unit = {
      marker(0xdb); u16(67); out.write(id)
      q.foreach(out.write) // already zigzag-ordered
    }
    dqt(0, qLum)
    if (!gray) dqt(1, qChr)
    marker(0xc0) // SOF0 baseline
    val nc = if (gray) 1 else 3
    u16(8 + 3 * nc); out.write(8); u16(h); u16(w); out.write(nc)
    for (c <- 1 to nc) {
      out.write(c)          // component id
      out.write(0x11)       // 4:4:4 — H=V=1 everywhere
      out.write(if (c == 1) 0 else 1) // quant table id
    }
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(19 + vals.length); out.write((cls << 4) | id)
      for (l <- 1 to 16) out.write(bits(l))
      vals.foreach(out.write)
    }
    dht(0, 0, dcLumBits, dcLumVals)
    dht(1, 0, acLumBits, acLumVals)
    if (!gray) { dht(0, 1, dcChrBits, dcChrVals); dht(1, 1, acChrBits, acChrVals) }
    marker(0xda) // SOS
    u16(6 + 2 * nc); out.write(nc)
    for (c <- 1 to nc) { out.write(c); out.write(if (c == 1) 0x00 else 0x11) }
    out.write(0); out.write(63); out.write(0) // spectral selection, approx
  }

  /** Encode 8-bit grayscale `pixels(row)(col)` (0..255) as baseline JFIF. */
  def encodeGray(width: Int, height: Int, pixels: Array[Array[Int]],
                 quality: Int = 90): Array[Byte] = {
    require(width > 0 && height > 0, "JPEG dims must be positive")
    require(pixels.length == height, s"expected $height rows")
    val qLum = scaledQ(stdLumQ.zipWithIndex.map { case (_, i) => stdLumQ(zigzag(i)) },
      quality)
    val out = new java.io.ByteArrayOutputStream(width * height / 4 + 1024)
    writeMarkers(out, width, height, gray = true, qLum, qLum)
    val bw = new BitWriter(out)
    var prevDc = 0
    val block = new Array[Double](64)
    var by = 0
    while (by < height) {
      var bx = 0
      while (bx < width) {
        var i = 0
        while (i < 64) {
          val y = math.min(by + i / 8, height - 1)
          val x = math.min(bx + i % 8, width - 1) // edge replication padding
          block(i) = pixels(y)(x) - 128.0
          i += 1
        }
        prevDc = encodeBlock(bw, block, qLum, dcLumEnc, acLumEnc, prevDc)
        bx += 8
      }
      by += 8
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Encode packed 0xRRGGBB `pixels(row)(col)` as baseline 4:4:4 JFIF. */
  def encodeRgb(width: Int, height: Int, pixels: Array[Array[Int]],
                quality: Int = 90): Array[Byte] = {
    require(width > 0 && height > 0, "JPEG dims must be positive")
    require(pixels.length == height, s"expected $height rows")
    val qLum = scaledQ(Array.tabulate(64)(i => stdLumQ(zigzag(i))), quality)
    val qChr = scaledQ(Array.tabulate(64)(i => stdChrQ(zigzag(i))), quality)
    val out = new java.io.ByteArrayOutputStream(width * height / 2 + 2048)
    writeMarkers(out, width, height, gray = false, qLum, qChr)
    val bw = new BitWriter(out)
    val prevDc = new Array[Int](3)
    val block = new Array[Double](64)
    def comp(p: Int, c: Int): Double = { // JFIF RGB→YCbCr
      val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val bl = p & 0xff
      c match {
        case 0 => 0.299 * r + 0.587 * g + 0.114 * bl - 128.0
        case 1 => -0.168736 * r - 0.331264 * g + 0.5 * bl
        case _ => 0.5 * r - 0.418688 * g - 0.081312 * bl
      }
    }
    var by = 0
    while (by < height) {
      var bx = 0
      while (bx < width) {
        var c = 0
        while (c < 3) {
          var i = 0
          while (i < 64) {
            val y = math.min(by + i / 8, height - 1)
            val x = math.min(bx + i % 8, width - 1)
            block(i) = comp(pixels(y)(x), c)
            i += 1
          }
          prevDc(c) = encodeBlock(bw, block,
            if (c == 0) qLum else qChr,
            if (c == 0) dcLumEnc else dcChrEnc,
            if (c == 0) acLumEnc else acChrEnc, prevDc(c))
          c += 1
        }
        bx += 8
      }
      by += 8
    }
    bw.flush()
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  // ---- decoder --------------------------------------------------------

  private final class HuffDec(bits: Array[Int], vals: Array[Int]) {
    // mincode/maxcode/valptr per length (T.81 F.2.2.3)
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (l <- 1 to 16) {
        if (bits(l) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l); k += bits(l)
          maxCode(l) = code - 1
        }
        code <<= 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var l = 1
      while (l < 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | br.bit()
        l += 1
      }
      require(maxCode(l) >= 0 && code <= maxCode(l), "bad Huffman code")
      vals(valPtr(l) + code - minCode(l))
    }
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var sawMarker = false
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < bytes.length, "JPEG entropy stream truncated")
        var v = bytes(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          require(pos < bytes.length, "JPEG entropy stream truncated at 0xFF")
          val m = bytes(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed byte
          else { sawMarker = true; v = 0xff } // leave marker for caller
        }
        acc = v; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def reset(): Unit = { nbits = 0 }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Decode a baseline JFIF/JPEG stream. Returns (width, height,
    * nComponents, pixels) where pixels(row)(col) is gray 0..255 for 1
    * component or packed 0xRRGGBB for 3. */
  def decode(bytes: Array[Byte]): (Int, Int, Int, Array[Array[Int]]) = {
    require(bytes.length > 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "not a JPEG (missing SOI)")
    var pos = 2
    def u16(at: Int): Int = ((bytes(at) & 0xff) << 8) | (bytes(at + 1) & 0xff)
    val qtabs = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffDec](4)
    val acTabs = new Array[HuffDec](4)
    var width = 0; var height = 0
    var nComp = 0
    var compId: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var compDc: Array[Int] = null
    var compAc: Array[Int] = null
    var restartInterval = 0
    var scanStart = -1

    while (scanStart < 0) {
      require(pos + 4 <= bytes.length, "truncated JPEG header")
      require((bytes(pos) & 0xff) == 0xff, s"expected marker at $pos")
      val m = bytes(pos + 1) & 0xff
      pos += 2
      m match {
        case 0xd8 => // stray SOI
        case 0x01 => // TEM, parameterless
        case _ =>
          val len = u16(pos)
          // a marker segment length includes its own 2 bytes; < 2 would
          // make the walk non-advancing on corrupt input
          require(len >= 2 && pos + len <= bytes.length,
            s"bad segment ${m.toHexString} length $len")
          m match {
            case 0xdb => // DQT — may hold several tables
              var p = pos + 2
              while (p < pos + len) {
                val pq = (bytes(p) & 0xff) >> 4
                val tq = bytes(p) & 0x0f
                require(pq == 0 || pq == 1, "bad DQT precision")
                require(tq <= 3, s"bad DQT table id $tq")
                val n = if (pq == 0) 64 else 128
                require(p + 1 + n <= pos + len, "DQT table runs past its segment")
                qtabs(tq) = Array.tabulate(64)(i =>
                  if (pq == 0) bytes(p + 1 + i) & 0xff else u16(p + 1 + 2 * i))
                p += 1 + n
              }
            case 0xc4 => // DHT — may hold several tables
              var p = pos + 2
              while (p < pos + len) {
                val cls = (bytes(p) & 0xff) >> 4
                val id = bytes(p) & 0x0f
                require(cls <= 1 && id <= 3, s"bad DHT class/id $cls/$id")
                require(p + 17 <= pos + len, "DHT counts run past their segment")
                val bits = new Array[Int](17)
                var total = 0
                for (l <- 1 to 16) { bits(l) = bytes(p + l) & 0xff; total += bits(l) }
                require(p + 17 + total <= pos + len, "DHT values run past their segment")
                val vals = Array.tabulate(total)(i => bytes(p + 17 + i) & 0xff)
                val t = new HuffDec(bits, vals)
                if (cls == 0) dcTabs(id) = t else acTabs(id) = t
                p += 17 + total
              }
            case 0xc0 | 0xc1 => // SOF0/1 (baseline / extended sequential)
              require(len >= 9, "SOF segment too short")
              require(bytes(pos + 2) == 8, "only 8-bit precision supported")
              height = u16(pos + 3); width = u16(pos + 5)
              nComp = bytes(pos + 7) & 0xff
              require(nComp == 1 || nComp == 3, s"$nComp components unsupported")
              require(len >= 8 + 3 * nComp, "SOF component table runs past its segment")
              compId = new Array[Int](nComp); compH = new Array[Int](nComp)
              compV = new Array[Int](nComp); compQ = new Array[Int](nComp)
              for (c <- 0 until nComp) {
                compId(c) = bytes(pos + 8 + 3 * c) & 0xff
                val hv = bytes(pos + 9 + 3 * c) & 0xff
                compH(c) = hv >> 4; compV(c) = hv & 0x0f
                require(compH(c) >= 1 && compH(c) <= 2 &&
                  compV(c) >= 1 && compV(c) <= 2,
                  s"sampling ${compH(c)}x${compV(c)} unsupported")
                compQ(c) = bytes(pos + 10 + 3 * c) & 0xff
                require(compQ(c) <= 3, s"bad quant table id ${compQ(c)}")
              }
            case 0xc2 =>
              throw new IllegalArgumentException("progressive JPEG not supported")
            case 0xdd =>
              restartInterval = u16(pos + 2)
            case 0xda => // SOS
              val ns = bytes(pos + 2) & 0xff
              require(ns == nComp, "scan component count mismatch")
              require(len >= 3 + 2 * ns + 3, "SOS segment too short")
              compDc = new Array[Int](nComp); compAc = new Array[Int](nComp)
              for (c <- 0 until ns) {
                val id = bytes(pos + 3 + 2 * c) & 0xff
                val idx = compId.indexOf(id)
                require(idx >= 0, s"scan references unknown component $id")
                val tt = bytes(pos + 4 + 2 * c) & 0xff
                compDc(idx) = tt >> 4; compAc(idx) = tt & 0x0f
                require(compDc(idx) <= 3 && compAc(idx) <= 3,
                  s"bad Huffman table ids $tt")
              }
              scanStart = pos + len
            case 0xd9 =>
              throw new IllegalArgumentException("EOI before SOS")
            case _ => // APPn / COM / others: skip
          }
          pos += len
      }
    }
    require(width > 0 && height > 0, "missing SOF")

    val maxH = compH.max; val maxV = compV.max
    val mcuW = 8 * maxH; val mcuH = 8 * maxV
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    // per-component plane at its own resolution
    val planeW = Array.tabulate(nComp)(c => mcusX * compH(c) * 8)
    val planeH = Array.tabulate(nComp)(c => mcusY * compV(c) * 8)
    val planes = Array.tabulate(nComp)(c => new Array[Int](planeW(c) * planeH(c)))

    val br = new BitReader(bytes, scanStart)
    val prevDc = new Array[Int](nComp)
    val coef = new Array[Double](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // expect RSTn marker, byte-aligned
        br.reset()
        var p = br.pos
        while (p + 1 < bytes.length && (bytes(p) & 0xff) == 0xff &&
          (bytes(p + 1) & 0xff) >= 0xd0 && (bytes(p + 1) & 0xff) <= 0xd7) p += 2
        require(p > br.pos, s"missing restart marker before MCU $mcu")
        br.pos = p
        br.sawMarker = false
        java.util.Arrays.fill(prevDc, 0)
      }
      val my = mcu / mcusX; val mx = mcu % mcusX
      var c = 0
      while (c < nComp) {
        var v = 0
        while (v < compV(c)) {
          var hblk = 0
          while (hblk < compH(c)) {
            // decode one block
            val q = qtabs(compQ(c))
            require(q != null, "missing quant table")
            val dcT = dcTabs(compDc(c)); val acT = acTabs(compAc(c))
            require(dcT != null && acT != null, "missing Huffman table")
            java.util.Arrays.fill(coef, 0.0)
            val s = dcT.decode(br)
            prevDc(c) += extend(br.receive(s), s)
            coef(0) = prevDc(c).toDouble * q(0)
            var k = 1
            while (k < 64) {
              val rs = acT.decode(br)
              val r = rs >> 4; val sz = rs & 0x0f
              if (sz == 0) {
                if (r == 15) k += 15 else k = 64 // ZRL / EOB
              } else {
                k += r
                require(k < 64, "AC run overflow")
                coef(zigzag(k)) = extend(br.receive(sz), sz).toDouble * q(k)
              }
              k += 1
            }
            val px = idct(coef)
            val bx0 = (mx * compH(c) + hblk) * 8
            val by0 = (my * compV(c) + v) * 8
            var i = 0
            while (i < 64) {
              val vv = math.max(0, math.min(255,
                math.round(px(i) + 128.0).toInt))
              planes(c)((by0 + i / 8) * planeW(c) + bx0 + i % 8) = vv
              i += 1
            }
            hblk += 1
          }
          v += 1
        }
        c += 1
      }
      mcu += 1
    }

    // assemble output; chroma upsampled by sample replication
    val out = Array.ofDim[Int](height, width)
    if (nComp == 1) {
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { out(y)(x) = planes(0)(y * planeW(0) + x); x += 1 }
        y += 1
      }
    } else {
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          def samp(c: Int): Int = {
            val sx = x * compH(c) / maxH
            val sy = y * compV(c) / maxV
            planes(c)(sy * planeW(c) + sx)
          }
          val yy = samp(0); val cb = samp(1) - 128; val cr = samp(2) - 128
          def clamp(d: Double): Int = math.max(0, math.min(255, math.round(d).toInt))
          val r = clamp(yy + 1.402 * cr)
          val g = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          val bl = clamp(yy + 1.772 * cb)
          out(y)(x) = (r << 16) | (g << 8) | bl
          x += 1
        }
        y += 1
      }
    }
    (width, height, nComp, out)
  }
}
