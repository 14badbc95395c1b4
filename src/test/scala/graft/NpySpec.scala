package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.Npy

/** NPY codec: round trips plus cross-implementation conformance against
  * files written by NumPy itself (tools/npy_golden_*.npy, generated with
  * np.save — f4 and f8, the two dtypes the decoder accepts). */
class NpySpec extends AnyFunSuite {

  test("f32 encode → decode round-trips exactly") {
    var s = 99L
    val m = Array.fill(17, 9) {
      s = s * 6364136223846793005L + 1442695040888963407L
      java.lang.Float.intBitsToFloat(((s >>> 33) & 0x3f7fffffL).toInt)
    }
    val bytes = Npy.encodeF32(m)
    // header block 64-aligned, dict readable
    assert((bytes.length - 4 * 17 * 9) % 64 == 0)
    val (n, d, out) = Npy.decode(bytes)
    assert((n, d) == (17, 9))
    for (i <- 0 until 17; j <- 0 until 9)
      assert(out(i)(j) == m(i)(j).toDouble, s"($i,$j)")
  }

  test("decodes NumPy-written f4 and f8 goldens") {
    val f4 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/npy_golden_f4.npy"))
    val (n4, d4, v4) = Npy.decode(f4)
    assert((n4, d4) == (4, 5))
    for (i <- 0 until 4; j <- 0 until 5)
      assert(v4(i)(j) == ((i * 7 + j * 3 + 1) * 0.25f).toDouble, s"f4 ($i,$j)")

    val f8 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/npy_golden_f8.npy"))
    val (n8, d8, v8) = Npy.decode(f8)
    assert((n8, d8) == (6, 3))
    for (i <- 0 until 6; j <- 0 until 3)
      assert(v8(i)(j) == (i * 11 + j) * 0.125 - 2.0, s"f8 ($i,$j)")
  }

  test("decodes NumPy-written NPZ archives, stored and compressed") {
    for (f <- Seq("tools/npz_golden.npz", "tools/npz_golden_c.npz")) {
      val m = Npy.decodeNpz(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(f)))
      assert(m.keySet == Set("alpha", "beta"), f)
      val (an, ad, av) = m("alpha")
      assert((an, ad) == (2, 2) && av(1)(0) == 3.5, f)
      val (bn, bd, bv) = m("beta")
      assert((bn, bd) == (1, 3) && bv(0)(1) == -0.75, f)
    }
    intercept[IllegalArgumentException](Npy.decodeNpz(Array[Byte](1, 2, 3)))
  }

  test("junk, wrong dtype, and truncation throw by name") {
    intercept[IllegalArgumentException](Npy.decode("nope".getBytes))
    val good = Npy.encodeF32(Array(Array(1f, 2f), Array(3f, 4f)))
    intercept[IllegalArgumentException](Npy.decode(good.take(good.length - 3)))
    // forge an integer descr: decoder must reject, not misread
    val forged = new String(good, "ISO-8859-1").replace("<f4", "<i4")
      .getBytes("ISO-8859-1")
    intercept[IllegalArgumentException](Npy.decode(forged))
  }
}
