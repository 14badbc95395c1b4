package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable HyperLogLog cardinality sketch (Flajolet et al. 2007) as a
  * typed `Aggregator` — the user-facing API twin of the oracle-gated
  * `a_hll_est` query. State is 64 one-byte registers; `merge` is an
  * element-wise max, so Spark's partial aggregation tree-merges the
  * sketch across any number of executors (or Structured Streaming
  * micro-batches — the complete-mode parity proven live for the query
  * form in StreamMultimodalSpec applies identically here).
  *
  * Hashing is md5-derived EXACTLY like the query (register index = first
  * hash byte mod 64; rank = leading-zero count of the next 48 bits + 1),
  * so the Aggregator's registers are bit-identical to the query's
  * `max(rho) GROUP BY idx` table and HllAggSpec can cross-validate the
  * two implementations value-for-value. The estimate applies the m = 64
  * constant α = 0.709 with the standard small-range linear-counting
  * correction; expected relative error is 1.04/√64 ≈ 13%.
  */
object HllAgg extends Aggregator[String, Array[Byte], Double]
    with Serializable {

  private val M = 64

  /** The small-range (linear-counting) correction table — SHARED with
    * the a_hll_est query so the two implementations cannot drift. */
  val smallTab: Array[Double] = (1 to M).map(v =>
    math.floor(M.toDouble * math.log(M.toDouble / v) * 1e6 + 0.5) / 1e6).toArray

  /** Estimate from the exact integer harmonic denominator Σ2^(49−M[j])
    * and the zero-register count — the single definition of the
    * estimator math (query literals and driver recomputes mirror it). */
  def estimate(sint: Long, vz: Int): Double = {
    val raw = ((0.709 * 4096.0) * 562949953421312.0) / sint.toDouble
    if (raw <= 2.5 * M && vz > 0) smallTab(vz - 1)
    else math.floor(raw * 1e6 + 0.5) / 1e6
  }

  // md5() resets after each digest call; thread-local so the hot
  // aggregation path never re-runs the security-provider lookup
  @transient private lazy val mdLocal =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  override def zero: Array[Byte] = new Array[Byte](M)

  override def reduce(regs: Array[Byte], x: String): Array[Byte] = {
    if (x != null) {
      val h = mdLocal.get().digest(x.getBytes("UTF-8"))
      val idx = (h(0) & 0xff) % M
      var w = 0L // next 48 bits = hash bytes 1..6 (hex digits 3..14)
      var i = 1
      while (i <= 6) { w = (w << 8) | (h(i) & 0xffL); i += 1 }
      val rho =
        if (w == 0L) 49
        else 49 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(idx)) regs(idx) = rho.toByte
    }
    regs
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** Estimate, canonically 1e-6-rounded like the query's `hll_est`. */
  override def finish(regs: Array[Byte]): Double = {
    var sint = 0L // Σ 2^(49 − M[j]) — exact integer harmonic denominator
    var vz = 0
    var i = 0
    while (i < M) {
      sint += 1L << (49 - regs(i))
      if (regs(i) == 0) vz += 1
      i += 1
    }
    estimate(sint, vz)
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
