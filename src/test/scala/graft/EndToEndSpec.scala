package graft

import org.apache.spark.sql.functions._
import graft.api.ErrorAnalysis
import graft.raster.GridMeta
import graft.rng.Rand

/** The strongest validation (SURVEY.md §5 item 5): run the FULL analysis
  * pipeline — difference → stable-ground bias → multi-run variogram →
  * spherical fit → per-polygon uncertainty — over a synthetic Δz field
  * with KNOWN spatial correlation, and check the recovered structure.
  *
  * Field construction: moving-average smoothing of counter-RNG white
  * noise over a disk of radius R gives a stationary field whose variogram
  * rises from ~0 and plateaus at ~2R (disk-overlap covariance) — the fit
  * must find a range near 2R and a total sill near the field variance.
  */
class EndToEndSpec extends SparkSuite {

  private val W = 96
  private val R = 6 // smoothing radius ⇒ correlation length ≈ 2R = 12 cells

  /** Correlated field: z(c,r) = mean of white noise over the R-disk,
    * built distributed via the same offset-explode stencil as the
    * terrain ops. Plus a constant bias of 0.35 in raster B. */
  private def smoothedNoise(salt: Long) = {
    val offs = for (dr <- -R to R; dc <- -R to R
                    if dc * dc + dr * dr <= R * R) yield (dc, dr)
    val offCol = array(offs.map { case (dc, dr) =>
      struct(lit(dc).as("dc"), lit(dr).as("dr")) }: _*)
    spark.range(W.toLong * W)
      .select((col("id") % W).cast("int").as("col"),
        (col("id") / W).cast("int").as("row"),
        Rand.gaussian(col("id"), salt).as("noise"))
      .select(col("col"), col("row"), col("noise"), explode(offCol).as("o"))
      .select((col("col") + col("o.dc")).as("col"),
        (col("row") + col("o.dr")).as("row"), col("noise"))
      .filter(col("col") >= 0 && col("col") < W && col("row") >= 0 && col("row") < W)
      .groupBy("col", "row").agg(avg("noise").as("value"))
  }

  test("full pipeline recovers bias and correlation structure") {
    val meta = GridMeta(width = W, height = W)
    val ea = new ErrorAnalysis(spark, meta)
    val a = smoothedNoise(101)
    val b = smoothedNoise(202).withColumn("value", col("value") + 0.35)
    val dz = ea.difference(a, b).persist()

    // 1. bias over a stable rectangle ≈ 0.35
    val stableWkt = "POLYGON ((2.1 2.1, 93.9 2.1, 93.9 45.4, 2.1 45.4))"
    val (bias, biasUnc) = ea.biasOverStable(dz, stableWkt)
    assert(math.abs(bias - 0.35) < 0.05, s"bias $bias")
    assert(biasUnc > 0 && biasUnc < 0.05, s"biasUnc $biasUnc")

    val debiased = ea.removeBias(dz, bias)

    // 2. variogram + fit: range should reflect the ~2R correlation length
    val binW = 4.0
    val cross = ea.empiricalVariogram(debiased, nRuns = 4, sampleSize = 700,
      maxLag = 48.0, binWidth = binW)
    val best = ea.fitModel(cross, binW)
    val fieldVar = debiased.agg(var_pop(col("value"))).head().getDouble(0)
    val totalSill = best.model.sills.sum + best.model.nugget
    assert(totalSill > 0.4 * fieldVar && totalSill < 2.5 * fieldVar,
      s"sill $totalSill vs var $fieldVar")
    val mainRange = best.model.ranges.max
    assert(mainRange > R && mainRange < 8.0 * R, s"range $mainRange")

    // 3. per-polygon uncertainty: correlated term within the sill scale,
    // total = quadrature
    val foi = Seq("foi_rect" -> "POLYGON ((10.2 55.3, 80.4 55.3, 80.4 90.1, 10.2 90.1))")
    val rep = ea.uncertainty(debiased, foi, best.model).collect().head
    assert(rep.getAs[Long]("nPixels") > 1000)
    val uncorr = rep.getAs[Double]("uncorrelated")
    val corr = rep.getAs[Double]("correlated")
    val total = rep.getAs[Double]("total")
    assert(uncorr > 0 && corr >= 0)
    assert(math.abs(total - math.sqrt(uncorr * uncorr + corr * corr)) < 1e-12)
    // correlated term is bounded by the total sill's scale
    assert(corr <= math.sqrt(totalSill) + 1e-9)

    // 4. robust dispersion: NMAD of the (near-Gaussian) debiased field
    // tracks its σ within a loose band, and never exceeds the raw std
    // wildly — the sanity envelope robust stats must live in
    val nmad = ea.nmad(debiased, stableWkt)
    val sd = math.sqrt(fieldVar)
    assert(nmad > 0.4 * sd && nmad < 1.6 * sd, s"nmad $nmad vs sd $sd")
    dz.unpersist()
  }
}
