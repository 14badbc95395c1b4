package graft

import org.apache.spark.sql.functions._
import graft.functions.Spherical
import graft.queries.QueriesVario

/** Heteroscedastic Monte-Carlo uncertainty (u_mc_hetero /
  * u_mc_hetero_raster; estimate_monte_carlo with sigma_func,
  * variography_uncertainty.py:1263–1274, 1386–1416).
  */
class McHeteroSpec extends SparkSuite {

  private val s2 = Spherical.canonical.totalSill

  test("constant sigma reduces exactly to the homoscedastic estimator") {
    // E[ρ(h)·σ·σ] with σ = √σ²_tot is algebraically E[σ²_tot − γ(h)] —
    // the u_mc_correlated estimand. Drive the REAL query path with a
    // constant σ grid and assert the reduction to float precision.
    val constGrid = spark.range(64).select(
      (col("id") % 8).as("gx"),
      (col("id") / 8).cast("long").as("gy"),
      lit(math.sqrt(s2)).as("sigma"))
    val hetero = QueriesVario.mcSigmaEstimate(
      spark, QueriesVario.mcPairs(spark), cell = 100.0,
      outName = "sigma_hetero", grid = Some(constGrid))
      .head().getAs[Double]("sigma_hetero")
    val homo = SparkEntry.queries("u_mc_correlated")(spark, sf001)
      .head().getAs[Double]("sigma_correlated")
    assert(math.abs(hetero - homo) < 2e-6,
      s"constant-sigma hetero $hetero != homoscedastic $homo")
  }

  test("grid sigma bounds the estimate: sigma_hetero <= max-cell-sigma") {
    // |E[ρ σX σY]| ≤ max σ² because |ρ| ≤ 1 (the clip) — so the reported
    // σ_A can never exceed the largest cell σ.
    val r = SparkEntry.queries("u_mc_hetero")(spark, sf001).head()
    val maxSig = QueriesVario.sigmaGrid(spark)
      .agg(max("sigma")).head().getDouble(0)
    val v = r.getAs[Double]("sigma_hetero")
    assert(v >= 0.0 && v <= maxSig + 1e-9, s"sigma_hetero $v vs max cell $maxSig")
    assert(r.getAs[Long]("n_pairs") == 20000L)
  }

  test("every pair endpoint resolves a sigma cell (no silent inner-join drop)") {
    // the estimator inner-joins pairs to the grid twice; a grid that
    // failed to cover the sampling domain would silently shrink n_pairs
    val n = QueriesVario.mcSigmaEstimate(
      spark, QueriesVario.mcPairs(spark), cell = 100.0, outName = "s")
      .head().getAs[Long]("n_pairs")
    assert(n == 20000L, s"grid dropped ${20000L - n} pairs")
  }

  test("raster-footprint variant: pairs come from the diamond, capped at N") {
    val r = SparkEntry.queries("u_mc_hetero_raster")(spark, sf001).head()
    val n = r.getAs[Long]("n_pairs")
    // diamond acceptance is exactly 0.5 of the bbox; 3x headroom means the
    // cap at 10000 engages with overwhelming margin
    assert(n == 10000L, s"expected the N cap to bind, got $n pairs")
    val v = r.getAs[Double]("sigma_hetero_raster")
    assert(v >= 0.0 && v < 1.0)
  }
}
