package graft.ingest

/** Thin wrappers over the JDK's `java.util.zip` Deflater/Inflater
  * (RFC 1950/1951 — the public zlib container). Used by the
  * Compression=8 GeoTIFF path ([[GeoTiff.encodeDeflate]]) and the PNG
  * codec ([[Png]]): both formats wrap their pixel chunks in exactly this
  * stream. Pure JVM, no native libraries beyond the JDK itself.
  *
  * Determinism note: `deflate` output depends on the JDK's zlib build,
  * so nothing in the oracle gate ever hashes COMPRESSED bytes — every
  * round-trip query decodes back to pixels and compares those. `inflate`
  * is exact for any conformant stream regardless of producer.
  */
object Zlib {

  /** zlib-wrapped DEFLATE at the default level. */
  def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(raw)
      d.finish()
      val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) {
        val n = d.deflate(buf)
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally d.end()
  }

  /** Inflate a zlib stream; `expected >= 0` pre-sizes the buffer and is
    * validated against the actual output length when given. Corrupt or
    * truncated streams throw. */
  def inflate(comp: Array[Byte], expected: Int = -1): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(comp)
      val out = new java.io.ByteArrayOutputStream(
        if (expected >= 0) expected else math.max(64, comp.length * 3))
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch { // corrupt stream: the codec-family contract is IAE by name
            case e: java.util.zip.DataFormatException =>
              throw new IllegalArgumentException(s"corrupt zlib stream: ${e.getMessage}", e)
          }
        if (n == 0) {
          require(!inf.needsInput() && !inf.needsDictionary(),
            "truncated or dictionary-requiring zlib stream")
        } else out.write(buf, 0, n)
      }
      val res = out.toByteArray
      require(expected < 0 || res.length == expected,
        s"zlib stream inflated to ${res.length} bytes, expected $expected")
      res
    } finally inf.end()
  }
}
