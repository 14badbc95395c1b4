package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

class FastacSpec extends AnyFunSuite {

  test("symbol model round trip (64 symbols)") {
    var s = 12345L
    def nxt(): Int = { s = s * 6364136223846793005L + 1442695040888963407L; ((s >>> 33) % 64).toInt }
    val syms = Array.fill(5000)(nxt())
    val encM = new SymbolModel(64, false)
    val enc = new ArithEncoder
    syms.foreach(x => enc.encodeSymbol(encM, x))
    val bytes = enc.done()
    val decM = new SymbolModel(64, true)
    val dec = new ArithDecoder(bytes, 0, bytes.length)
    for (i <- syms.indices) {
      val got = dec.decodeSymbol(decM)
      assert(got == syms(i), s"i=$i")
    }
  }

  test("bit model round trip") {
    var s = 99L
    def nxt(): Int = { s = s * 6364136223846793005L + 1442695040888963407L; ((s >>> 33) % 5).toInt }
    val bits = Array.fill(5000)(if (nxt() == 0) 1 else 0)
    val encM = new BitModel
    val enc = new ArithEncoder
    bits.foreach(x => enc.encodeBit(encM, x))
    val bytes = enc.done()
    val decM = new BitModel
    val dec = new ArithDecoder(bytes, 0, bytes.length)
    for (i <- bits.indices) assert(dec.decodeBit(decM) == bits(i), s"i=$i")
  }

  test("raw bits round trip") {
    val vals = Seq((5, 17L), (19, 400000L), (32, 0xDEADBEEFL), (16, 65535L), (1, 1L), (32, 0L))
    val enc = new ArithEncoder
    vals.foreach { case (w, v) => enc.writeBits(w, v) }
    val bytes = enc.done()
    val dec = new ArithDecoder(bytes, 0, bytes.length)
    vals.foreach { case (w, v) => assert(dec.readBits(w) == v, s"width $w") }
  }

  test("IntComp round trip all widths") {
    var s = 7L
    def nxt(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s >>> 16 }
    val vals32 = Array.fill(2000)(nxt().toInt) ++ Array(0, 1, -1, Int.MinValue, Int.MaxValue, 0, 0)
    val preds32 = Array.fill(vals32.length)(nxt().toInt)
    val enc = new ArithEncoder
    val e32 = new Laz.IntComp(32, 2, false)
    val e16 = new Laz.IntComp(16, 4, false)
    val e8 = new Laz.IntComp(8, 2, false)
    for (i <- vals32.indices) {
      e32.compress(enc, preds32(i), vals32(i), (i % 2))
      e16.compress(enc, (preds32(i) & 0xFFFF), (vals32(i) & 0xFFFF), i % 4)
      e8.compress(enc, (preds32(i) & 0xFF), (vals32(i) & 0xFF), i % 2)
    }
    val bytes = enc.done()
    val dec = new ArithDecoder(bytes, 0, bytes.length)
    val d32 = new Laz.IntComp(32, 2, true)
    val d16 = new Laz.IntComp(16, 4, true)
    val d8 = new Laz.IntComp(8, 2, true)
    for (i <- vals32.indices) {
      assert(d32.decompress(dec, preds32(i), i % 2) == vals32(i), s"32 i=$i")
      assert(d16.decompress(dec, preds32(i) & 0xFFFF, i % 4) == (vals32(i) & 0xFFFF), s"16 i=$i")
      assert(d8.decompress(dec, preds32(i) & 0xFF, i % 2) == (vals32(i) & 0xFF), s"8 i=$i")
    }
  }

  test("Point10V2 round trip alone") {
    var s = 77L
    def nxt(n: Int): Int = { s = s * 6364136223846793005L + 1442695040888963407L; ((s >>> 33) % n).toInt }
    val pts = Array.tabulate(2000) { i =>
      Laz.P10(1000000 + nxt(4000) - 2000 + i * 10, -500000 + nxt(2000), 150000 + nxt(600),
        0, 0x11, nxt(32), 0, 0, 0)
    }
    val enc = new ArithEncoder
    val ep = new Laz.Point10V2(false)
    ep.init(pts(0))
    for (i <- 1 until pts.length) ep.compress(enc, pts(i))
    val bytes = enc.done()
    val dec = new ArithDecoder(bytes, 0, bytes.length)
    val dp = new Laz.Point10V2(true)
    dp.init(pts(0))
    for (i <- 1 until pts.length) {
      val got = dp.decompress(dec)
      assert(got == pts(i), s"i=$i got $got want ${pts(i)}")
    }
  }

  test("GpsTime11V2 round trip alone") {
    val times = Array.tabulate(1000) { i =>
      if (i % 50 == 17) 9.9e300 + i
      else if (i % 7 == 0) 1000.0 + (i / 7) * 0.001
      else 5.0e9 + i * 0.002
    }
    val bits = times.map(java.lang.Double.doubleToRawLongBits)
    val enc = new ArithEncoder
    val eg = new Laz.GpsTime11V2(false)
    eg.init(bits(0))
    for (i <- 1 until bits.length) eg.compress(enc, bits(i))
    val bytes = enc.done()
    val dec = new ArithDecoder(bytes, 0, bytes.length)
    val dg = new Laz.GpsTime11V2(true)
    dg.init(bits(0))
    for (i <- 1 until bits.length)
      assert(dg.decompress(dec) == bits(i), s"i=$i")
  }

  test("mixed models interleaved") {
    var s = 5L
    def nxt(n: Int): Int = { s = s * 6364136223846793005L + 1442695040888963407L; ((s >>> 33) % n).toInt }
    val ops = Array.fill(3000)(nxt(3))
    val symsA = ops.map(_ => nxt(6))
    val symsB = ops.map(_ => nxt(516))
    val bitsC = ops.map(_ => nxt(2))
    val eA = new SymbolModel(6, false); val eB = new SymbolModel(516, false); val eC = new BitModel
    val enc = new ArithEncoder
    for (i <- ops.indices) ops(i) match {
      case 0 => enc.encodeSymbol(eA, symsA(i))
      case 1 => enc.encodeSymbol(eB, symsB(i))
      case 2 => enc.encodeBit(eC, bitsC(i))
    }
    val bytes = enc.done()
    val dA = new SymbolModel(6, true); val dB = new SymbolModel(516, true); val dC = new BitModel
    val dec = new ArithDecoder(bytes, 0, bytes.length)
    for (i <- ops.indices) ops(i) match {
      case 0 => assert(dec.decodeSymbol(dA) == symsA(i), s"A i=$i")
      case 1 => assert(dec.decodeSymbol(dB) == symsB(i), s"B i=$i")
      case 2 => assert(dec.decodeBit(dC) == bitsC(i), s"C i=$i")
    }
  }
}
