package graft.ingest

import scala.collection.mutable.ArrayBuffer

/** TIFF-flavor LZW codec (TIFF 6.0 spec §13, the scheme GDAL writes for
  * the reference's LZW-compressed rasters — differencing_functions.py:
  * 696–705 `"compress": "LZW"`). Pure JVM, ~100 lines:
  *
  *   - MSB-first bit packing, 9→12-bit variable-width codes
  *   - ClearCode = 256, EndOfInformation = 257, first table code 258
  *   - EARLY CHANGE: the code width grows when the next free code hits
  *     2^width − 1 (one code early — the libtiff/GDAL convention)
  *   - the encoder resets the table with a ClearCode before it would
  *     overflow 12 bits; the decoder accepts a Clear at any point, so it
  *     reads externally-produced streams regardless of their reset point
  *
  * Decode handles the KwKwK self-referential case (code == next free
  * code). Round-trip exactness over every strip/tile is pinned by the
  * oracle-gated `i_geotiff_lzw_roundtrip` query and GeoTiffSpec.
  */
object Lzw {

  private val Clear = 256
  private val Eoi = 257
  private val First = 258
  private val MaxWidth = 12
  // reset threshold: stay strictly below the 12-bit ceiling (4095) so an
  // early-change bump can never be required past MaxWidth
  private val ResetAt = 4093

  def encode(data: Array[Byte]): Array[Byte] = {
    val out = new BitWriter
    var dict = new java.util.HashMap[Int, Integer](8192)
    var nextCode = First
    var width = 9
    def reset(): Unit = { dict = new java.util.HashMap(8192); nextCode = First; width = 9 }
    out.put(Clear, width)
    if (data.isEmpty) { out.put(Eoi, width); return out.result() }
    var prefix = data(0) & 0xff
    var i = 1
    while (i < data.length) {
      val c = data(i) & 0xff
      val key = (prefix << 8) | c
      val hit = dict.get(key)
      if (hit != null) prefix = hit.intValue()
      else {
        out.put(prefix, width)
        dict.put(key, Integer.valueOf(nextCode))
        nextCode += 1
        if (nextCode == (1 << width) - 1 && width < MaxWidth) width += 1
        if (nextCode >= ResetAt) { out.put(Clear, width); reset() }
        prefix = c
      }
      i += 1
    }
    out.put(prefix, width)
    out.put(Eoi, width)
    out.result()
  }

  def decode(data: Array[Byte]): Array[Byte] = {
    val in = new BitReader(data)
    val out = new ArrayBuffer[Byte](data.length * 3)
    val table = new Array[Array[Byte]](1 << MaxWidth)
    var i = 0
    while (i < 256) { table(i) = Array(i.toByte); i += 1 }
    var nextCode = First
    var width = 9
    var old = -1
    var code = in.get(width)
    while (code != Eoi && code >= 0) {
      if (code == Clear) {
        nextCode = First; width = 9; old = -1
      } else {
        val entry =
          if (code < nextCode) table(code)
          else if (code == nextCode && old >= 0) table(old) :+ table(old)(0)
          else throw new IllegalArgumentException(
            s"corrupt LZW stream: code $code beyond table size $nextCode")
        out ++= entry
        if (old >= 0) {
          table(nextCode) = table(old) :+ entry(0)
          nextCode += 1
        }
        // early change, decoder side: the table lags the encoder by one
        // entry (the first code after a Clear adds nothing), so the
        // width grows one entry earlier than the encoder's own rule
        if (nextCode == (1 << width) - 2 && width < MaxWidth) width += 1
        old = code
      }
      code = in.get(width)
    }
    out.toArray
  }

  private final class BitWriter {
    private val buf = new ArrayBuffer[Byte]
    private var acc = 0L
    private var nBits = 0
    def put(code: Int, width: Int): Unit = {
      acc = (acc << width) | (code & ((1L << width) - 1))
      nBits += width
      while (nBits >= 8) {
        buf += ((acc >>> (nBits - 8)) & 0xff).toByte
        nBits -= 8
      }
    }
    def result(): Array[Byte] = {
      if (nBits > 0) { buf += ((acc << (8 - nBits)) & 0xff).toByte; nBits = 0 }
      buf.toArray
    }
  }

  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private var acc = 0L
    private var nBits = 0
    /** Next `width`-bit code, or −1 at end of stream. */
    def get(width: Int): Int = {
      while (nBits < width) {
        if (pos >= data.length) return -1
        acc = (acc << 8) | (data(pos) & 0xffL)
        pos += 1
        nBits += 8
      }
      nBits -= width
      ((acc >>> nBits) & ((1L << width) - 1)).toInt
    }
  }
}
