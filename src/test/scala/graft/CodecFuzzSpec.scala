package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{Las, Laz, Laz14}

/** Hostile-input fuzz over the point-cloud byte codecs: random byte
  * flips and truncations of VALID containers must either decode to SOME
  * array (arithmetic-stream desync legally yields garbage points — the
  * coder cannot detect it) or throw IllegalArgumentException by name
  * (the codec-family contract). What must NEVER escape: index
  * out-of-bounds, negative array sizes, arithmetic overflow surprises,
  * OOM-sized allocations — the failure classes the Long-math and
  * full-header bounds hardening exist to prevent. Deterministic:
  * mutation positions come from the counter RNG, so a failure
  * reproduces by seed. */
class CodecFuzzSpec extends AnyFunSuite {

  private def rnd(i: Long, salt: Long, mod: Int): Int =
    (graft.rng.Rand.mixLong(i, salt) % mod).toInt

  private def cloud(n: Int): Array[Las.P6] =
    Array.tabulate(n) { i =>
      val k = graft.rng.Rand.mixLong(i.toLong, 77L)
      Las.P6(
        x = (k % 1000) / 4.0, y = ((k / 1000) % 1000) / 4.0,
        z = ((k / 1000000) % 500) / 8.0,
        intensity = (k % 60000).toInt,
        returnNo = 1 + (k % 3).toInt, nReturns = 3,
        channel = (k % 4).toInt,
        classification = (k % 32).toInt,
        scanAngle = (k % 100).toInt - 50,
        sourceId = (k % 100).toInt,
        gpsTime = 1e5 + i * 0.25)
    }

  /** Returns a defect description, or None if the outcome is contractual. */
  private def probe(decode: Array[Byte] => Any, bytes: Array[Byte]): Option[String] =
    try { decode(bytes); None }
    catch {
      case _: IllegalArgumentException => None // the documented contract
      case e: Throwable => Some(s"${e.getClass.getName}: ${e.getMessage}")
    }

  private def fuzz(name: String, good: Array[Byte],
                   decode: Array[Byte] => Any, iters: Int): Unit = {
    val defects = scala.collection.mutable.ArrayBuffer.empty[String]
    for (i <- 0 until iters) {
      val b = good.clone()
      // 1-4 random byte flips
      val flips = 1 + rnd(i.toLong, 1000 + i, 4)
      for (j <- 0 until flips) {
        val pos = rnd(i.toLong * 7 + j, 2000 + i, b.length)
        b(pos) = (b(pos) ^ (1 << rnd(i.toLong * 13 + j, 3000 + i, 8))).toByte
      }
      probe(decode, b).foreach(d => defects += s"$name flip iter=$i: $d")
      // random truncation of the pristine container
      val cut = rnd(i.toLong, 4000 + i, good.length)
      probe(decode, good.take(cut)).foreach(d => defects += s"$name cut=$cut: $d")
    }
    assert(defects.isEmpty,
      s"${defects.length} non-contractual failures; first: ${defects.headOption.getOrElse("")}")
  }

  test("LAZ14 layered containers: flips and truncations never escape the contract") {
    fuzz("laz14", Laz14.encode(cloud(200), chunkSize = 64),
      bs => Laz14.decode(bs), iters = 300)
  }

  test("LAZ 1.2 containers: flips and truncations never escape the contract") {
    val pts = cloud(200).map(p => (p.x, p.y, p.z, p.classification, p.gpsTime))
    fuzz("laz", Laz.encodeTimed(pts, chunkSize = 64),
      bs => Laz.decodeTimed(bs), iters = 300)
  }

  test("raw LAS 1.4 fmt 6: flips and truncations never escape the contract") {
    fuzz("las14", Las.encode14(cloud(200)), bs => Las.decode14(bs), iters = 300)
  }

  test("raw LAS 1.2 fmt 1: flips and truncations never escape the contract") {
    val pts = cloud(200).map(p => (p.x, p.y, p.z, p.classification, p.gpsTime))
    fuzz("las12", Las.encodeTimed(pts), bs => Las.decodeTimed(bs), iters = 300)
  }
}
