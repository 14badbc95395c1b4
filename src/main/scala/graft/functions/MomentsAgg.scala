package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass numerically stable central moments (count, mean, M2–M4)
  * via the parallel Welford/Chan merge — the optional custom aggregate of
  * SURVEY.md §2.11 ("11-stat summary … a TypedImperativeAggregate
  * computing moments"), realized as a typed `Aggregator` (the public
  * custom-aggregation API, codegen-merged buffers).
  *
  * Unlike the raw power sums used by the oracle-gated stats queries
  * (which must be formula-identical to DuckDB), this form is
  * cancellation-free: E[x⁴]−4μE[x³]+… loses ~log2(μ⁴/σ⁴) bits for
  * off-center data, while M-moment updates stay at full precision —
  * the right aggregate for a 100-TB single pass over ill-conditioned
  * columns.
  */
case class MomentState(n: Long, mean: Double, m2: Double, m3: Double, m4: Double)
case class Moments(n: Long, mean: Double, variance: Double,
                   skewness: Double, kurtosis: Double)

object MomentsAgg extends Aggregator[Double, MomentState, Moments] {

  override def zero: MomentState = MomentState(0L, 0.0, 0.0, 0.0, 0.0)

  override def reduce(s: MomentState, x: Double): MomentState =
    merge(s, MomentState(1L, x, 0.0, 0.0, 0.0))

  /** Chan et al. pairwise-merge update — exact for both single elements
    * and partition buffers. */
  override def merge(a: MomentState, b: MomentState): MomentState = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    val n = a.n + b.n
    val d = b.mean - a.mean
    val d2 = d * d
    val na = a.n.toDouble; val nb = b.n.toDouble; val nn = n.toDouble
    val mean = a.mean + d * nb / nn
    val m2 = a.m2 + b.m2 + d2 * na * nb / nn
    val m3 = a.m3 + b.m3 +
      d * d2 * na * nb * (na - nb) / (nn * nn) +
      3.0 * d * (na * b.m2 - nb * a.m2) / nn
    val m4 = a.m4 + b.m4 +
      d2 * d2 * na * nb * (na * na - na * nb + nb * nb) / (nn * nn * nn) +
      6.0 * d2 * (na * na * b.m2 + nb * nb * a.m2) / (nn * nn) +
      4.0 * d * (na * b.m3 - nb * a.m3) / nn
    MomentState(n, mean, m2, m3, m4)
  }

  override def finish(s: MomentState): Moments = {
    val v = if (s.n > 0) s.m2 / s.n else Double.NaN
    Moments(s.n, s.mean, v,
      if (v > 0) (s.m3 / s.n) / math.pow(v, 1.5) else Double.NaN,
      if (v > 0) (s.m4 / s.n) / (v * v) - 3.0 else Double.NaN)
  }

  override def bufferEncoder: Encoder[MomentState] = Encoders.product[MomentState]
  override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]

  /** Untyped-column form for DataFrame `agg`. */
  def column: Column = org.apache.spark.sql.functions.udaf(this).apply(
    org.apache.spark.sql.functions.col("v"))
}
