package graft

import graft.functions.SphericalModel
import graft.uncert.Estimators

/** Cross-method agreement (SURVEY.md §5 item 2, mirroring the reference's
  * own validation at variography_uncertainty.py:995–998): the brute-force
  * double sum, the FFT autocorrelation estimator, and Monte-Carlo pairs
  * must agree on σ_A for the same region and model. */
class EstimatorSpec extends SparkSuite {

  private val m = SphericalModel(Seq(0.04), Seq(12.0), 0.005)
  private val (w, h) = (30, 20)

  test("FFT estimator equals brute force on the same discrete grid") {
    val brute = Estimators.bruteForceSigma(spark, m, w, h)
    val mask = Array.fill(h, w)(true)
    val fft = Estimators.fftSigma(m, mask)
    assert(math.abs(fft - brute) / brute < 1e-9,
      s"fft $fft vs brute $brute")
  }

  test("Monte-Carlo pairs agree with brute force within sampling error") {
    val brute = Estimators.bruteForceSigma(spark, m, w, h)
    val mc = Estimators.mcSigmaRect(spark, m, w.toDouble, h.toDouble, 60000)
    assert(math.abs(mc - brute) / brute < 0.10, s"mc $mc vs brute $brute")
  }

  test("FFT estimator handles a non-rectangular mask") {
    // L-shaped mask: counts must reflect the true pair set, which the
    // closed-form rectangle logic cannot produce
    val mask = Array.tabulate(h, w)((r, c) => !(r >= h / 2 && c >= w / 2))
    val fft = Estimators.fftSigma(m, mask)
    assert(fft > 0 && fft < math.sqrt(m.totalSill))
    // fewer long-distance pairs than the full rect ⇒ larger mean cov
    val full = Estimators.fftSigma(m, Array.fill(h, w)(true))
    assert(fft > full, s"L-mask $fft should exceed full-rect $full")
  }
}
