package graft.ingest

import scala.collection.mutable.ArrayBuffer

/** Adaptive arithmetic coder for the LAZ (LASzip) point-cloud codec —
  * Amir Said's "FastAC" range coder exactly as specified in the public
  * LAZ Specification 1.4 (laszip.org) and Said's "Introduction to
  * Arithmetic Coding — Theory and Practice" (HP Labs TR 2004-76).
  *
  * This is the entropy layer the reference's PDAL `writers.las` with
  * `"compression": "laszip"` produces (`differencing_functions.py:
  * 707–735`). Original Scala implementation from the published
  * algorithm description; 32-bit unsigned state is carried in `Long`s
  * masked to 32 bits.
  *
  * Mechanics (all from the spec): interval state (base, length) with
  * renormalization at 2^24 by emitting the top byte; adaptive models
  * keep scaled cumulative frequencies under `1 << 15` (symbol models)
  * or `1 << 13` (binary models) and rescale on a growing update cycle;
  * decoder symbol search uses the spec's table-accelerated binary
  * search for models wider than 16 symbols.
  */
private[ingest] object Fastac {
  val MinLength: Long = 0x01000000L // renorm threshold 2^24
  val MaxLength: Long = 0xFFFFFFFFL
  val DmLengthShift = 15
  val DmMaxCount = 1 << DmLengthShift
  val BmLengthShift = 13
  val BmMaxCount = 1 << BmLengthShift
}

/** Adaptive multi-symbol model. `forDecoding` builds the decoder's
  * lookup table (models wider than 16 symbols). */
private[ingest] final class SymbolModel(val symbols: Int, forDecoding: Boolean) {
  import Fastac._
  val distribution = new Array[Int](symbols)
  private val symbolCount = new Array[Int](symbols)
  var decoderTable: Array[Int] = null
  var tableShift = 0
  private var totalCount = 0
  private var updateCycle = 0
  private var symbolsUntilUpdate = 0

  if (forDecoding && symbols > 16) {
    var tableBits = 3
    while (symbols > (1 << (tableBits + 2))) tableBits += 1
    decoderTable = new Array[Int]((1 << tableBits) + 2)
    tableShift = DmLengthShift - tableBits
  }
  reset()

  def reset(): Unit = {
    java.util.Arrays.fill(symbolCount, 1)
    totalCount = 0
    updateCycle = symbols
    update()
    updateCycle = (symbols + 6) >> 1
    symbolsUntilUpdate = updateCycle
  }

  /** Count an observed symbol; rescale on cycle expiry. */
  def tally(sym: Int): Unit = {
    symbolCount(sym) += 1
    symbolsUntilUpdate -= 1
    if (symbolsUntilUpdate == 0) update()
  }

  private def update(): Unit = {
    totalCount += updateCycle
    if (totalCount > DmMaxCount) {
      totalCount = 0
      var n = 0
      while (n < symbols) {
        symbolCount(n) = (symbolCount(n) + 1) >> 1
        totalCount += symbolCount(n)
        n += 1
      }
    }
    val scale = 0x80000000L / totalCount
    var k = 0
    var sum = 0L
    if (decoderTable == null) {
      while (k < symbols) {
        distribution(k) = ((scale * sum) >> (31 - DmLengthShift)).toInt
        sum += symbolCount(k)
        k += 1
      }
    } else {
      var s = 0
      while (k < symbols) {
        distribution(k) = ((scale * sum) >> (31 - DmLengthShift)).toInt
        sum += symbolCount(k)
        val w = distribution(k) >>> tableShift
        while (s < w) { s += 1; decoderTable(s) = k - 1 }
        k += 1
      }
      decoderTable(0) = 0
      val tableSize = decoderTable.length - 2
      var t = s
      while (t <= tableSize) { t += 1; decoderTable(t) = symbols - 1 }
    }
    updateCycle = (5 * updateCycle) >> 2
    val maxCycle = (symbols + 6) << 3
    if (updateCycle > maxCycle) updateCycle = maxCycle
    symbolsUntilUpdate = updateCycle
  }
}

/** Adaptive binary model. */
private[ingest] final class BitModel {
  import Fastac._
  var bit0Prob: Int = 1 << (BmLengthShift - 1)
  var bit0Count = 1
  private var bitCount = 2
  private var updateCycle = 4
  var bitsUntilUpdate = 4

  def update(): Unit = {
    bitCount += updateCycle
    if (bitCount > BmMaxCount) {
      bitCount = (bitCount + 1) >> 1
      bit0Count = (bit0Count + 1) >> 1
      if (bit0Count == bitCount) bitCount += 1
    }
    val scale = 0x80000000L / bitCount
    bit0Prob = ((bit0Count * scale) >> (31 - BmLengthShift)).toInt
    updateCycle = (5 * updateCycle) >> 2
    if (updateCycle > 64) updateCycle = 64
    bitsUntilUpdate = updateCycle
  }
}

private[ingest] final class ArithEncoder {
  import Fastac._
  private val out = new ArrayBuffer[Byte](1024)
  private var base = 0L
  private var length = MaxLength

  def encodeSymbol(m: SymbolModel, sym: Int): Unit = {
    val initBase = base
    if (sym == m.symbols - 1) {
      val x = (m.distribution(sym).toLong * (length >>> DmLengthShift))
      base = (base + x) & MaxLength
      length -= x
      if (initBase > base) propagateCarry()
    } else {
      length = length >>> DmLengthShift
      val x = m.distribution(sym).toLong * length
      base = (base + x) & MaxLength
      length = m.distribution(sym + 1).toLong * length - x
      if (initBase > base) propagateCarry()
    }
    if (length < MinLength) renorm()
    m.tally(sym)
  }

  def encodeBit(m: BitModel, bit: Int): Unit = {
    val x = m.bit0Prob.toLong * (length >>> BmLengthShift)
    if (bit == 0) {
      length = x
      m.bit0Count += 1
    } else {
      val initBase = base
      base = (base + x) & MaxLength
      length -= x
      if (initBase > base) propagateCarry()
    }
    if (length < MinLength) renorm()
    m.bitsUntilUpdate -= 1
    if (m.bitsUntilUpdate == 0) m.update()
  }

  /** Raw (model-free) bits, low 16 first for widths over 19 — the spec's
    * split keeps `length` from underflowing 2^24 twice per call. */
  def writeBits(bits: Int, value: Long): Unit = {
    if (bits > 19) {
      writeBits(16, value & 0xFFFF)
      writeBits(bits - 16, value >>> 16)
      return
    }
    val initBase = base
    length = length >>> bits
    base = (base + value * length) & MaxLength
    if (initBase > base) propagateCarry()
    if (length < MinLength) renorm()
  }

  def writeInt(v: Long): Unit = { writeBits(16, v & 0xFFFF); writeBits(16, (v >>> 16) & 0xFFFF) }

  private def propagateCarry(): Unit = {
    var p = out.length - 1
    while (p >= 0 && out(p) == 0xFF.toByte) { out(p) = 0; p -= 1 }
    require(p >= 0, "arithmetic-coder carry before any output byte")
    out(p) = (out(p) + 1).toByte
  }

  private def renorm(): Unit = {
    while (length < MinLength) {
      out += ((base >>> 24) & 0xFF).toByte
      base = (base << 8) & MaxLength
      length = (length << 8) & MaxLength
    }
  }

  /** Flush the interval (spec: shift base to the shortest tail that any
    * conformant decoder resolves to the encoded symbols) and return the
    * byte stream. */
  def done(): Array[Byte] = {
    val initBase = base
    if (length > 2 * MinLength) {
      base = (base + MinLength) & MaxLength
      length = MinLength >>> 1
    } else {
      base = (base + (MinLength >>> 1)) & MaxLength
      length = MinLength >>> 9
    }
    if (initBase > base) propagateCarry()
    renorm()
    out.toArray
  }
}

/** Decoder over `buf[start, end)`. Reads past `end` yield zero bytes: the
  * encoder's `done()` may emit up to three bytes fewer than the decoder's
  * four-byte lookahead consumes, and in a chunked LAZ stream the bytes
  * past `end` belong to the NEXT chunk — the slice boundary keeps chunk
  * decodes independent (and therefore distributable). */
private[ingest] final class ArithDecoder(buf: Array[Byte], start: Int, end: Int) {
  import Fastac._
  private var pos = start
  private var value = 0L
  private var length = MaxLength
  private def inByte(): Long = {
    val b = if (pos < end) (buf(pos) & 0xFF).toLong else 0L
    pos += 1
    b
  }
  value = (inByte() << 24) | (inByte() << 16) | (inByte() << 8) | inByte()

  def decodeSymbol(m: SymbolModel): Int = {
    var sym = 0
    var x = 0L
    var y = length
    if (m.decoderTable != null) {
      length = length >>> DmLengthShift
      val dv = value / length
      val t = (dv >>> m.tableShift).toInt
      sym = m.decoderTable(t)
      var n = m.decoderTable(t + 1) + 1
      while (n > sym + 1) {
        val k = (sym + n) >>> 1
        if (m.distribution(k) > dv) n = k else sym = k
      }
      x = m.distribution(sym).toLong * length
      if (sym != m.symbols - 1) y = m.distribution(sym + 1).toLong * length
    } else {
      length = length >>> DmLengthShift
      var n = m.symbols
      var k = n >>> 1
      var continue = true
      while (continue) {
        val z = length * m.distribution(k).toLong
        if (z > value) { n = k; y = z } else { sym = k; x = z }
        k = (sym + n) >>> 1
        continue = k != sym
      }
    }
    value -= x
    length = y - x
    if (length < MinLength) renorm()
    m.tally(sym)
    sym
  }

  def decodeBit(m: BitModel): Int = {
    val x = m.bit0Prob.toLong * (length >>> BmLengthShift)
    val sym = if (value >= x) 1 else 0
    if (sym == 0) {
      length = x
      m.bit0Count += 1
    } else {
      value -= x
      length -= x
    }
    if (length < MinLength) renorm()
    m.bitsUntilUpdate -= 1
    if (m.bitsUntilUpdate == 0) m.update()
    sym
  }

  def readBits(bits: Int): Long = {
    if (bits > 19) {
      val lo = readBits(16)
      val hi = readBits(bits - 16) << 16
      return hi | lo
    }
    length = length >>> bits
    val sym = value / length
    value -= length * sym
    if (length < MinLength) renorm()
    sym
  }

  def readInt(): Long = { val lo = readBits(16); val hi = readBits(16); (hi << 16) | lo }

  private def renorm(): Unit = {
    while (length < MinLength) {
      value = ((value << 8) | inByte()) & MaxLength
      length = (length << 8) & MaxLength
    }
  }
}
