package graft

import org.apache.spark.sql.functions._
import graft.raster.Terrain

/** The Nuth–Kääb estimator (r_coreg_nuthkaab's kernel) must recover a
  * TRUE sub-pixel misregistration, not just fit its own synthetic dh:
  * build DEM A from a smooth analytic surface, DEM B by evaluating the
  * SAME surface at coordinates shifted by (dx, dy) plus a bias dz —
  * a genuinely shifted terrain, no Taylor shortcut — difference them on
  * the grid, and run the gradient-basis least squares. First-order
  * recovery error is O(shift² · curvature), so at 0.3-cell shifts the
  * estimate must land within a few percent. */
class CoregSpec extends SparkSuite {
  import spark.implicits._

  // smooth rolling terrain: gentle quadratic bowl + two sinusoid fields
  private def z(x: Double, y: Double): Double =
    20.0 * math.sin(x / 17.0) * math.cos(y / 23.0) +
      12.0 * math.sin((x + y) / 31.0) + 0.002 * (x - 64) * (x - 64)

  test("gradient-basis LS recovers a true sub-pixel shift + bias") {
    val (dxT, dyT, dzT) = (0.3, -0.25, 1.5)
    val w = 128
    val cells = (for (r <- 0 until w; c <- 0 until w) yield {
      val a = z(c, r)
      val b = z(c + dxT, r + dyT) + dzT
      (c, r, a, b - a)
    }).toDF("col", "row", "value", "dh_true")

    val nb = Terrain.neighborhood(cells.select("col", "row", "value"))
      .join(cells.select(col("col"), col("row"), col("dh_true")), Seq("col", "row"))
    val g = nb.select(Terrain.gx(1.0).as("gx"), Terrain.gy(1.0).as("gy"),
      col("dh_true").as("dh"))
    val s = g.agg(
      count(lit(1)).cast("double").as("n"),
      sum("gx").as("sgx"), sum("gy").as("sgy"),
      sum(col("gx") * col("gx")).as("sxx"), sum(col("gx") * col("gy")).as("sxy"),
      sum(col("gy") * col("gy")).as("syy"), sum("dh").as("sdh"),
      sum(col("gx") * col("dh")).as("sxd"), sum(col("gy") * col("dh")).as("syd"))
      .head()
    val (n, sgx, sgy, sxx, sxy, syy, sdh, sxd, syd) =
      (s.getDouble(0), s.getDouble(1), s.getDouble(2), s.getDouble(3),
        s.getDouble(4), s.getDouble(5), s.getDouble(6), s.getDouble(7),
        s.getDouble(8))
    val det = sxx * (syy * n - sgy * sgy) - sxy * (sxy * n - sgy * sgx) +
      sgx * (sxy * sgy - syy * sgx)
    val dx = (sxd * (syy * n - sgy * sgy) - sxy * (syd * n - sgy * sdh) +
      sgx * (syd * sgy - syy * sdh)) / det
    val dy = (sxx * (syd * n - sgy * sdh) - sxd * (sxy * n - sgy * sgx) +
      sgx * (sxy * sdh - syd * sgx)) / det
    val dz = (sxx * (syy * sdh - syd * sgy) - sxy * (sxy * sdh - syd * sgx) +
      sxd * (sxy * sgy - syy * sgx)) / det

    assert(math.abs(dx - dxT) < 0.02, s"dx $dx vs $dxT")
    assert(math.abs(dy - dyT) < 0.02, s"dy $dy vs $dyT")
    assert(math.abs(dz - dzT) < 0.05, s"dz $dz vs $dzT")
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
