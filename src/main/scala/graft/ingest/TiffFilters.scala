package graft.ingest

/** PackBits byte-oriented RLE (TIFF 6.0 §9, Compression=32773 — the
  * Macintosh-era scheme every TIFF reader still ships). Encoder emits
  * per-scanline restarts as the spec recommends; the decoder is a pure
  * stream unpacker, so restart boundaries are transparent. */
object PackBits {

  /** Encode one buffer; `rowBytes` > 0 restarts packets at scanline
    * boundaries (spec: "always encode rows separately"). */
  def encode(data: Array[Byte], rowBytes: Int): Array[Byte] = {
    require(rowBytes > 0 && data.length % rowBytes == 0,
      s"data ${data.length} not a multiple of rowBytes $rowBytes")
    val out = new java.io.ByteArrayOutputStream(data.length + data.length / 64 + 16)
    var rs = 0
    while (rs < data.length) {
      val re = rs + rowBytes
      var i = rs
      while (i < re) {
        // run of ≥2 equal bytes → replicate packet (n ≤ 128)
        var run = 1
        while (i + run < re && run < 128 && data(i + run) == data(i)) run += 1
        if (run >= 2) {
          out.write(1 - run) // -(run-1) as signed byte
          out.write(data(i))
          i += run
        } else {
          // literal packet: scan until a ≥2-run starts or 128 bytes
          var lit = 1
          while (i + lit < re && lit < 128 &&
            !(i + lit + 1 < re && data(i + lit + 1) == data(i + lit))) lit += 1
          out.write(lit - 1)
          out.write(data, i, lit)
          i += lit
        }
      }
      rs = re
    }
    out.toByteArray
  }

  def decode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 2 + 16)
    var i = 0
    while (i < data.length) {
      val n = data(i).toInt
      i += 1
      if (n >= 0) { // n+1 literal bytes
        require(i + n + 1 <= data.length, "PackBits literal overruns input")
        out.write(data, i, n + 1)
        i += n + 1
      } else if (n != -128) { // -n+1 copies of next byte; -128 is a no-op
        require(i < data.length, "PackBits run overruns input")
        val v = data(i)
        i += 1
        var k = 1 - n
        while (k > 0) { out.write(v); k -= 1 }
      }
    }
    out.toByteArray
  }
}

/** TIFF Predictor=3 — the floating-point horizontal-differencing filter
  * (TIFF TechNote 3; libtiff fpDiff/fpAcc, what GDAL writes with
  * `PREDICTOR=3` for Float32/64 rasters). Per scanline the sample bytes
  * are shuffled into big-endian byte planes (all MSBs first), then the
  * whole line is byte-wise horizontally differenced; floats with similar
  * exponents then compress far better under LZW/Deflate. */
object FpPredictor {

  /** In-place forward filter over whole scanlines: `data` holds rows of
    * `rowPx` samples × `bytesPerSample` bytes in `littleEndian` file
    * order. */
  def difference(data: Array[Byte], rowPx: Int, bytesPerSample: Int,
                 littleEndian: Boolean = true): Unit = {
    val rowBytes = rowPx * bytesPerSample
    require(rowBytes > 0 && data.length % rowBytes == 0,
      s"data ${data.length} not a multiple of row $rowBytes")
    val tmp = new Array[Byte](rowBytes)
    var rs = 0
    while (rs < data.length) {
      System.arraycopy(data, rs, tmp, 0, rowBytes)
      var i = 0
      while (i < rowPx) { // shuffle to big-endian byte planes
        var b = 0
        while (b < bytesPerSample) {
          val src = if (littleEndian) bytesPerSample - 1 - b else b
          data(rs + b * rowPx + i) = tmp(i * bytesPerSample + src)
          b += 1
        }
        i += 1
      }
      var j = rowBytes - 1 // horizontal byte differencing, back to front
      while (j > 0) {
        data(rs + j) = (data(rs + j) - data(rs + j - 1)).toByte
        j -= 1
      }
      rs += rowBytes
    }
  }

  /** In-place inverse filter (decode side). */
  def accumulate(data: Array[Byte], rowPx: Int, bytesPerSample: Int,
                 littleEndian: Boolean = true): Unit = {
    val rowBytes = rowPx * bytesPerSample
    require(rowBytes > 0 && data.length % rowBytes == 0,
      s"data ${data.length} not a multiple of row $rowBytes")
    val tmp = new Array[Byte](rowBytes)
    var rs = 0
    while (rs < data.length) {
      var j = 1
      while (j < rowBytes) { // integrate bytes
        data(rs + j) = (data(rs + j) + data(rs + j - 1)).toByte
        j += 1
      }
      System.arraycopy(data, rs, tmp, 0, rowBytes)
      var i = 0
      while (i < rowPx) { // deshuffle planes back to file byte order
        var b = 0
        while (b < bytesPerSample) {
          val dst = if (littleEndian) bytesPerSample - 1 - b else b
          data(rs + i * bytesPerSample + dst) = tmp(b * rowPx + i)
          b += 1
        }
        i += 1
      }
      rs += rowBytes
    }
  }
}
