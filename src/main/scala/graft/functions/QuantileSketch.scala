package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable streaming quantile sketch — the t-digest merging variant
  * (Dunning & Ertl, "Computing Extremely Accurate Quantiles Using
  * t-Digests", arXiv:1902.04023), realized as a typed `Aggregator` like
  * [[MomentsAgg]] so Spark's partial-aggregation machinery does the
  * distributed merge: O(δ) state per group regardless of group size —
  * the 100-TB shape for percentile dashboards where the 4-pass radix
  * selection of [[ExactQuantile]] (exact, but one job per pass) is more
  * machinery than the use case needs.
  *
  * The k1 scale function k(q) = δ/(2π)·asin(2q−1) caps cluster weight
  * so rank resolution tightens toward both tails; interpolation between
  * centroid midpoints gives ~0.3/δ mid-quantile rank error. Estimates
  * depend on Spark's merge order, so the query surface is rows-only by
  * design (like `a_approx_sketches`); QuantileSketchSpec pins the rank
  * error against [[ExactQuantile]] ground truth instead of the hash gate.
  */
case class TDigestState(means: Array[Double], weights: Array[Double],
                        n: Long, min: Double, max: Double)

class QuantileSketchAgg(compression: Int = 100)
    extends Aggregator[Double, TDigestState, TDigestState] with Serializable {

  private val bufferCap = compression * 5

  override def zero: TDigestState =
    TDigestState(Array.empty, Array.empty, 0L,
      Double.PositiveInfinity, Double.NegativeInfinity)

  override def reduce(s: TDigestState, x: Double): TDigestState = {
    val st = TDigestState(s.means :+ x, s.weights :+ 1.0, s.n + 1,
      math.min(s.min, x), math.max(s.max, x))
    if (st.means.length > bufferCap) compress(st) else st
  }

  override def merge(a: TDigestState, b: TDigestState): TDigestState = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    compress(TDigestState(a.means ++ b.means, a.weights ++ b.weights,
      a.n + b.n, math.min(a.min, b.min), math.max(a.max, b.max)))
  }

  /** Greedy in-order cluster merge under the k1 scale-function bound. */
  private def compress(s: TDigestState): TDigestState = {
    val idx = s.means.indices.toArray.sortBy(s.means)
    val total = s.weights.sum
    val outM = Array.newBuilder[Double]
    val outW = Array.newBuilder[Double]
    def k(q: Double): Double =
      compression / (2.0 * math.Pi) * math.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0)
    var done = 0.0              // weight in closed clusters
    var cm = s.means(idx(0)); var cw = s.weights(idx(0))
    var kLo = k(0.0)
    var i = 1
    while (i < idx.length) {
      val m = s.means(idx(i)); val w = s.weights(idx(i))
      if (k((done + cw + w) / total) - kLo <= 1.0) {
        cm += (m - cm) * w / (cw + w); cw += w
      } else {
        outM += cm; outW += cw; done += cw
        kLo = k(done / total)
        cm = m; cw = w
      }
      i += 1
    }
    outM += cm; outW += cw
    TDigestState(outM.result(), outW.result(), s.n, s.min, s.max)
  }

  override def finish(s: TDigestState): TDigestState = compress(s)

  override def bufferEncoder: Encoder[TDigestState] = Encoders.product[TDigestState]
  override def outputEncoder: Encoder[TDigestState] = Encoders.product[TDigestState]
}

object QuantileSketch {
  /** Quantile estimate from a digest: piecewise-linear interpolation
    * between centroid midpoints, exact min/max at the tails. */
  def quantileOf(s: TDigestState, q: Double): Double = {
    val m = s.means; val w = s.weights
    if (s.n == 0 || m.isEmpty) return Double.NaN
    if (m.length == 1) return m(0)
    val total = w.sum
    val target = q * total
    if (target <= w(0) / 2) return s.min
    var cum = 0.0
    var i = 0
    while (i < m.length - 1) {
      val mid = cum + w(i) / 2
      val nextMid = cum + w(i) + w(i + 1) / 2
      if (target >= mid && target < nextMid)
        return m(i) + (m(i + 1) - m(i)) * (target - mid) / (nextMid - mid)
      cum += w(i); i += 1
    }
    s.max
  }
}
