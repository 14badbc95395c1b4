package graft

import org.apache.spark.sql.functions._
import graft.raster.Coreg

/** The Nuth–Kääb estimator (r_coreg_nuthkaab's kernel, raster.Coreg)
  * must recover a TRUE sub-pixel misregistration, not just fit its own
  * synthetic dh: build DEM A from a smooth analytic surface, DEM B by
  * evaluating the SAME surface at coordinates shifted by (dx, dy) plus a
  * bias dz — a genuinely shifted terrain, no Taylor shortcut — difference
  * them on the grid, and fit. First-order recovery error is
  * O(shift² · curvature), so at 0.3-cell shifts the estimate must land
  * within a few percent; applying the fitted shift must then collapse
  * the difference's RMS by an order of magnitude. */
class CoregSpec extends SparkSuite {
  import spark.implicits._

  // smooth rolling terrain: gentle quadratic bowl + two sinusoid fields
  private def z(x: Double, y: Double): Double =
    20.0 * math.sin(x / 17.0) * math.cos(y / 23.0) +
      12.0 * math.sin((x + y) / 31.0) + 0.002 * (x - 64) * (x - 64)

  private val (dxT, dyT, dzT) = (0.3, -0.25, 1.5)
  private val w = 128
  private lazy val a = (for (r <- 0 until w; c <- 0 until w)
    yield (c, r, z(c, r))).toDF("col", "row", "value")
  private lazy val b = (for (r <- 0 until w; c <- 0 until w)
    yield (c, r, z(c + dxT, r + dyT) + dzT)).toDF("col", "row", "value")
  private def diff(x: org.apache.spark.sql.DataFrame,
                   y: org.apache.spark.sql.DataFrame) =
    x.select(col("col"), col("row"), col("value").as("va"))
      .join(y.select(col("col"), col("row"), col("value").as("vb")),
        Seq("col", "row"))
      .select(col("col"), col("row"), (col("vb") - col("va")).as("value"))

  test("Coreg.fit recovers a true sub-pixel shift + bias") {
    val f = Coreg.fit(a, diff(a, b))
    assert(math.abs(f.dx - dxT) < 0.02, s"dx ${f.dx} vs $dxT")
    assert(math.abs(f.dy - dyT) < 0.02, s"dy ${f.dy} vs $dyT")
    assert(math.abs(f.dz - dzT) < 0.05, s"dz ${f.dz} vs $dzT")
    assert(f.n > 15000)
  }

  test("Coreg.applyShift collapses the misregistration signature") {
    def rms(d: org.apache.spark.sql.DataFrame): Double = math.sqrt(
      d.agg(avg(col("value") * col("value"))).head().getDouble(0))
    val f = Coreg.fit(a, diff(a, b))
    val bCorr = Coreg.applyShift(b, f.dx, f.dy, f.dz)
    val before = rms(diff(a, b)
      .join(bCorr.select("col", "row"), Seq("col", "row"))) // same support
    val after = rms(diff(a, bCorr))
    assert(after < before / 10.0, s"rms before=$before after=$after")
    // and a re-fit on the corrected pair finds ~no residual shift
    val f2 = Coreg.fit(a, diff(a, bCorr))
    assert(math.abs(f2.dx) < 0.03 && math.abs(f2.dy) < 0.03 &&
      math.abs(f2.dz) < 0.05, f2.toString)
  }

  test("Coreg.iterate converges a LARGE shift one fit under-corrects") {
    // 0.9-cell shift: the Taylor linearization under-estimates it (the
    // single-fit reading is ~60-80% of truth on curved terrain), so the
    // published algorithm iterates; the loop must accumulate to the true
    // shift within tolerance and stop on its own
    val big = (for (r <- 0 until w; c <- 0 until w)
      yield (c, r, z(c + 0.9, r + 0.7) + 0.4)).toDF("col", "row", "value")
    val Coreg.IterResult(tot, steps, corrected, converged) =
      Coreg.iterate(a, big, maxIter = 10, tol = 0.02)
    assert(converged, "the loop must CONVERGE, not exhaust maxIter")
    assert(steps.size >= 2, s"one fit should not satisfy tol: $steps")
    // a one-iteration budget on a 0.9-cell shift is exhaustion, not
    // convergence — the flag must say so (and maxIter=0 rejects)
    assert(!Coreg.iterate(a, big, maxIter = 1, tol = 0.02).converged)
    intercept[IllegalArgumentException](Coreg.iterate(a, big, maxIter = 0))
    assert(math.abs(tot.dx - 0.9) < 0.05, s"dx ${tot.dx}")
    assert(math.abs(tot.dy - 0.7) < 0.05, s"dy ${tot.dy}")
    assert(math.abs(tot.dz - 0.4) < 0.05, s"dz ${tot.dz}")
    val res = Coreg.fit(a, diff(a, corrected))
    assert(math.abs(res.dx) < 0.02 && math.abs(res.dy) < 0.02, res.toString)
  }

  test("r_coreg_nuthkaab recovers its injected synthetic shift") {
    // sf0.01: the sf0.001 grid is too sparse for full 3x3 neighborhoods
    // (~37% cell fill -> 0.37^9 full stencils), so the fit there is the
    // degenerate all-null row — which both engines agree on (the gate
    // stays green); the recovery claim needs the denser grid
    val r = SparkEntry.queries("r_coreg_nuthkaab")(spark, "/root/testdata/sf0.01").head()
    // dh was built as 0.75·gx − 0.5·gy + 0.25 + zero-mean noise on the
    // same quantized gradients, so the fit must land ON the injection
    // (noise is uncorrelated with the basis up to sampling error)
    assert(math.abs(r.getAs[Double]("dx6") - 0.75) < 0.02, r.toString)
    assert(math.abs(r.getAs[Double]("dy6") + 0.5) < 0.02, r.toString)
    assert(math.abs(r.getAs[Double]("dz6") - 0.25) < 0.02, r.toString)
  }
}
