package graft.uncert

import breeze.linalg.DenseMatrix
import breeze.math.Complex
import breeze.signal.{fourierTr, iFourierTr}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.SphericalModel
import graft.rng.Rand

/** The reference's family of mean-covariance estimators for the areal
  * correlated uncertainty σ_A = √( (1/N²)·ΣΣ C(d_ij) ), each preserved as
  * an alternative method (`estimate(method=…)` dispatcher,
  * variography_uncertainty.py:1168–1182; SURVEY.md §4):
  *
  *  - analytical disk integral  (:1184–1195)  → QueriesVario.analyticalDisk
  *  - Monte-Carlo pairs         (:1238–1274)  → [[mcSigmaRect]]
  *  - brute-force double sum    (:1197–1234)  → [[bruteForceSigma]] (distributed)
  *  - FFT autocorrelation       (:1276–1320)  → [[fftSigma]] (driver Breeze,
  *    the one op kept driver-side — the padded mask grid is ≤ 512² doubles,
  *    SURVEY.md §2.9)
  *  - Hugonnet K-centers        (:1322–1378)  → QueriesVario.hugonnet
  *
  * Cross-method agreement is the reference's own validation strategy
  * (:995–998) and is asserted in EstimatorSpec.
  */
object Estimators {

  /** Distributed brute-force double sum over a w×h unit-cell grid:
    * every cell pair's covariance, averaged. O((wh)²) pairs — the
    * validation method, bounded by construction (grid_points=100,
    * variography_uncertainty.py:1197). */
  def bruteForceSigma(spark: SparkSession, m: SphericalModel,
                      w: Int, h: Int): Double = {
    require(w > 0 && h > 0, s"degenerate grid ${w}x$h")
    val cells = spark.range(w.toLong * h).select(
      (col("id") % w).cast("double").as("x"),
      (col("id") / w).cast("long").cast("double").as("y"))
    val a = cells.select(col("x").as("x1"), col("y").as("y1"))
    val b = cells.select(col("x").as("x2"), col("y").as("y2"))
    val meanCov = a.crossJoin(b)
      .select(m.cov(sqrt(
        (col("x2") - col("x1")) * (col("x2") - col("x1")) +
        (col("y2") - col("y1")) * (col("y2") - col("y1")))).as("c"))
      .agg(avg("c")).head().getDouble(0)
    math.sqrt(math.max(meanCov, 0.0))
  }

  /** FFT estimator: pair counts per lag via the autocorrelation of the
    * validity mask (next-pow-2 zero padding ⇒ linear, not circular,
    * correlation; differencing_functions-style padding at
    * variography_uncertainty.py:1292–1294), then
    * σ²_A = Σ_lag count(lag)·C(|lag|) / N². Exact for any mask shape. */
  def fftSigma(m: SphericalModel, mask: Array[Array[Boolean]]): Double = {
    val h = mask.length
    val w = mask(0).length
    def nextPow2(v: Int): Int = { var p = 1; while (p < v) p <<= 1; p }
    val ph = nextPow2(2 * h)
    val pw = nextPow2(2 * w)
    val grid = DenseMatrix.zeros[Complex](ph, pw)
    var n = 0L
    for (r <- 0 until h; c <- 0 until w if mask(r)(c)) {
      grid(r, c) = Complex(1.0, 0.0); n += 1
    }
    val f = fourierTr(grid)
    val power = f.map(z => z * z.conjugate)
    val auto = iFourierTr(power).map(_.real)
    // auto(dr mod ph, dc mod pw) = # pairs at lag (dr, dc)
    var acc = 0.0
    for (dr <- -(h - 1) to (h - 1); dc <- -(w - 1) to (w - 1)) {
      val cnt = auto(((dr % ph) + ph) % ph, ((dc % pw) + pw) % pw)
      if (cnt > 1e-6) {
        val dist = math.sqrt(dr.toDouble * dr + dc.toDouble * dc)
        acc += math.round(cnt).toDouble * (m.totalSill - m.gammaTotal(dist))
      }
    }
    math.sqrt(math.max(acc / (n.toDouble * n), 0.0))
  }

  /** Monte-Carlo mean covariance over seeded uniform point pairs in a
    * rectangle (variography_uncertainty.py:1238–1274). */
  def mcSigmaRect(spark: SparkSession, m: SphericalModel,
                  w: Double, h: Double, nPairs: Int, seed: Long = 42L): Double = {
    val u = (salt: Long) => Rand.u01(col("id"), seed + salt)
    val meanCov = spark.range(nPairs)
      .select(sqrt(
        (u(1) * w - u(3) * w) * (u(1) * w - u(3) * w) +
        (u(2) * h - u(4) * h) * (u(2) * h - u(4) * h)).as("d"))
      .select(m.cov(col("d")).as("c"))
      .agg(avg("c")).head().getDouble(0)
    math.sqrt(math.max(meanCov, 0.0))
  }
}
