package graft.api

import graft.functions.CacheRegistry.Shareable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Canon.round
import graft.functions.SphericalModel
import graft.fit.VariogramFit
import graft.fit.VariogramFit.Bin
import graft.geom.Geom
import graft.raster.{GridMeta, PixelGrid}
import graft.vario.Vario

/** High-level facade mirroring the reference's analysis workflow
  * (notebook cells 60–86): difference two aligned rasters, estimate and
  * remove vertical bias over stable ground, characterize spatially
  * correlated error with multi-run empirical variograms + a fitted nested
  * spherical model, and propagate correlated + uncorrelated uncertainty to
  * a per-polygon total. A user of the reference maps:
  *
  *  - `TopoDifferencer.save_difference_raster` → [[ErrorAnalysis.difference]]
  *  - notebook cell 74 median bias + bootstrap   → [[biasOverStable]]
  *  - `RasterDataHandler.sample_raster` + Numba kernel + `compute_matheron`
  *    + `calculate_mean_variogram` → [[empiricalVariogram]]
  *  - `fit_best_model` (TRF + AIC)  → [[fitModel]]
  *  - `RegionalUncertaintyEstimator` / `ApplyUncertainty` → [[uncertainty]]
  *
  * Everything table-sized stays distributed; only the ≤(runs×bins)
  * variogram and scalar statistics reach the driver.
  */
class ErrorAnalysis(spark: SparkSession, meta: GridMeta = GridMeta()) {

  /** Δz pixel table from two aligned pixel tables (inner join ⇒ NaN
    * propagation by absence). */
  def difference(a: DataFrame, b: DataFrame): DataFrame =
    PixelGrid.withXY(PixelGrid.difference(a, b), meta)
      .withColumnRenamed("dz", "value")

  /** Median vertical bias over the stable polygon + its bootstrap
    * uncertainty (1000×-style resample; variography_uncertainty.py:289–316).
    * Returns (bias, biasUncertainty). */
  def biasOverStable(dz: DataFrame, stableWkt: String,
                     nBoot: Int = 200, subSize: Int = 500,
                     seed: Long = 42L): (Double, Double) = {
    val verts = Geom.polyLit(Geom.wktToPoints(stableWkt))
    val stable = dz.filter(Geom.pointInPolygon(col("x"), col("y"), verts))
      .select(col("value")).persistShared()
    // clear failure over a degenerate polygon: percentile of an empty
    // relation is NULL and getDouble would throw ROW_VALUE_IS_NULL
    val n = stable.count()
    require(n > 0, s"stable polygon contains no pixels: $stableWkt")
    val bias = stable.agg(percentile(col("value"), lit(0.5))).head().getDouble(0)
    val idx = stable.withColumn("idx",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("value"))))
    val draws = spark.range(nBoot.toLong * subSize)
      .select((col("id") / subSize).cast("int").as("iter"),
        (graft.rng.Rand.mix(col("id"), seed) % n + 1).as("idx"))
    val unc = draws.join(idx, "idx")
      .groupBy("iter").agg(percentile(col("value"), lit(0.5)).as("med"))
      .agg(stddev_pop(col("med"))).head().getDouble(0)
    stable.unpersist()
    (bias, unc)
  }

  def removeBias(dz: DataFrame, bias: Double): DataFrame =
    dz.withColumn("value", col("value") - lit(bias))

  /** Robust dispersion of Δz inside a polygon:
    * NMAD = 1.4826 · median(|v − median(v)|) — the outlier-insensitive
    * σ-equivalent standard in DEM differencing practice (beside the
    * reference's classical std/RMS surfaces). Two exact interpolated
    * order statistics; nothing table-sized reaches the driver. */
  def nmad(dz: DataFrame, wkt: String): Double = {
    val verts = Geom.polyLit(Geom.wktToPoints(wkt))
    val in = dz.filter(Geom.pointInPolygon(col("x"), col("y"), verts))
      .select(col("value")).persistShared()
    try {
      require(!in.isEmpty, s"polygon contains no pixels: $wkt")
      val med = in.agg(percentile(col("value"), lit(0.5))).head().getDouble(0)
      1.4826 * in.select(abs(col("value") - lit(med)).as("a"))
        .agg(percentile(col("a"), lit(0.5))).head().getDouble(0)
    } finally { in.unpersist(); () }
  }

  /** Multi-run empirical variogram over the (debiased) Δz pixels:
    * seeded sample → neighbor-cell band join → Matheron bins → cross-run
    * reduction. Returns the small (bin-level) DataFrame. */
  def empiricalVariogram(dz: DataFrame, nRuns: Int = 5, sampleSize: Int = 800,
                         maxLag: Double = 60.0, binWidth: Double = 6.0)
      : DataFrame = {
    val pts = dz.select(
      (col("row").cast("long") * meta.width + col("col")).as("k"),
      col("x"), col("y"), col("value").as("v"))
    val sample = Vario.multiRunSample(pts, nRuns, sampleSize)
    Vario.crossRunReduce(
      Vario.matheron(Vario.bandPairs(sample, maxLag), binWidth))
  }

  /** Collect the cross-run variogram and fit the nested spherical model
    * search (driver-side Breeze; AIC argmin). */
  def fitModel(crossRun: DataFrame, binWidth: Double): VariogramFit.FitResult =
    VariogramFit.fit(VariogramFit.binsFromCrossRun(crossRun, binWidth))

  /** Per-polygon uncertainty report:
    * uncorrelated = RMS/√N over polygon pixels (:1544–1552);
    * correlated  = Monte-Carlo mean covariance over seeded point pairs in
    *               the polygon bbox (:1238–1274);
    * total       = quadrature (:1554–1573). */
  def uncertainty(dz: DataFrame, polygons: Seq[(String, String)],
                  model: SphericalModel, nPairs: Int = 20000,
                  seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val rows = polygons.map { case (name, wkt) =>
      val pts = Geom.wktToPoints(wkt)
      val verts = Geom.polyLit(pts)
      val inPoly = dz.filter(Geom.pointInPolygon(col("x"), col("y"), verts))
      val (n, rms) = {
        val r = inPoly.agg(count(lit(1)), sqrt(avg(col("value") * col("value"))))
          .head()
        (r.getLong(0), if (r.isNullAt(1)) Double.NaN else r.getDouble(1))
      }
      val uncorr = rms / math.sqrt(n.toDouble)
      // MC pairs uniform in the bbox, accepted inside the polygon
      val (minX, maxX) = (pts.map(_._1).min, pts.map(_._1).max)
      val (minY, maxY) = (pts.map(_._2).min, pts.map(_._2).max)
      val u = (salt: Long) => graft.rng.Rand.u01(col("id"), seed + salt)
      val mc = spark.range(nPairs * 3L) // rejection headroom
        .select(col("id"),
          (u(1) * (maxX - minX) + minX).as("x1"), (u(2) * (maxY - minY) + minY).as("y1"),
          (u(3) * (maxX - minX) + minX).as("x2"), (u(4) * (maxY - minY) + minY).as("y2"))
        .filter(Geom.pointInPolygon(col("x1"), col("y1"), verts) &&
                Geom.pointInPolygon(col("x2"), col("y2"), verts))
        .orderBy("id").limit(nPairs) // deterministic accepted-pair set
        .select(sqrt(pow(col("x2") - col("x1"), 2) + pow(col("y2") - col("y1"), 2)).as("h"))
      val meanCov = mc.agg(avg(model.cov(col("h")))).head().getDouble(0)
      val corr = math.sqrt(math.max(meanCov, 0.0))
      UncertaintyReport(name, n, bias = Double.NaN, rms,
        uncorrelated = uncorr, correlated = corr,
        total = math.sqrt(uncorr * uncorr + corr * corr))
    }
    rows.toDF()
  }

  /** Per-cell σ(x,y) map from the (debiased) Δz pixels: RMS of value over
    * `cell`-sized squares — the data-driven analog of the reference
    * raster handler's `sigma2_map` (variography_uncertainty.py:1345–1355;
    * its nearest-neighbour lookup becomes a cell-key broadcast join here).
    * One hash aggregate over the pixel table; the map is per-tile-sized
    * (≤ (extent/cell)² rows), a broadcast dim at any raster scale. */
  def sigmaMap(dz: DataFrame, cell: Double): DataFrame =
    dz.groupBy(
        floor(col("x") / cell).cast("long").as("gx"),
        floor(col("y") / cell).cast("long").as("gy"))
      .agg(sqrt(avg(col("value") * col("value"))).as("sigma"))

  /** Heteroscedastic per-polygon uncertainty: the correlated term becomes
    * E[ρ(‖X−Y‖)·σ(X)·σ(Y)] with ρ(h)=clip(1−γ(h)/σ²_tot, −1, 1)
    * (estimate_monte_carlo with sigma_func,
    * variography_uncertainty.py:1263–1274) — the chain the reference's
    * workflow implies: dh/dt-WLS weights → per-pixel σ map → MC
    * propagation. Same seeded rejection pair machinery as [[uncertainty]]
    * (identical salts, so a constant σ map = √σ²_tot reproduces its
    * correlated term exactly); each endpoint resolves σ via a broadcast
    * join on its `cell`-key, falling back to the polygon RMS for cells
    * the map doesn't cover (the nearest-neighbour analog of :1350–1353).
    */
  def uncertaintyHetero(dz: DataFrame, polygons: Seq[(String, String)],
                        model: SphericalModel, sigma: DataFrame, cell: Double,
                        nPairs: Int = 20000, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val sigmaB = sigma.persistShared()
    val rows = polygons.map { case (name, wkt) =>
      val pts = Geom.wktToPoints(wkt)
      val verts = Geom.polyLit(pts)
      val inPoly = dz.filter(Geom.pointInPolygon(col("x"), col("y"), verts))
      val (n, rms) = {
        val r = inPoly.agg(count(lit(1)), sqrt(avg(col("value") * col("value"))))
          .head()
        (r.getLong(0), if (r.isNullAt(1)) Double.NaN else r.getDouble(1))
      }
      val uncorr = rms / math.sqrt(n.toDouble)
      val (minX, maxX) = (pts.map(_._1).min, pts.map(_._1).max)
      val (minY, maxY) = (pts.map(_._2).min, pts.map(_._2).max)
      val u = (salt: Long) => graft.rng.Rand.u01(col("id"), seed + salt)
      val mc = spark.range(nPairs * 3L)
        .select(col("id"),
          (u(1) * (maxX - minX) + minX).as("x1"), (u(2) * (maxY - minY) + minY).as("y1"),
          (u(3) * (maxX - minX) + minX).as("x2"), (u(4) * (maxY - minY) + minY).as("y2"))
        .filter(Geom.pointInPolygon(col("x1"), col("y1"), verts) &&
                Geom.pointInPolygon(col("x2"), col("y2"), verts))
        .orderBy("id").limit(nPairs)
      val g1 = sigmaB.select(col("gx").as("gx1"), col("gy").as("gy1"),
        col("sigma").as("sig1"))
      val g2 = sigmaB.select(col("gx").as("gx2"), col("gy").as("gy2"),
        col("sigma").as("sig2"))
      val rho = greatest(lit(-1.0), least(lit(1.0), model.rho(
        sqrt(pow(col("x2") - col("x1"), 2) + pow(col("y2") - col("y1"), 2)))))
      val meanRhoSS = mc
        .withColumn("gx1", floor(col("x1") / cell).cast("long"))
        .withColumn("gy1", floor(col("y1") / cell).cast("long"))
        .withColumn("gx2", floor(col("x2") / cell).cast("long"))
        .withColumn("gy2", floor(col("y2") / cell).cast("long"))
        .join(broadcast(g1), Seq("gx1", "gy1"), "left")
        .join(broadcast(g2), Seq("gx2", "gy2"), "left")
        .select((rho * coalesce(col("sig1"), lit(rms)) *
          coalesce(col("sig2"), lit(rms))).as("t"))
        .agg(avg(col("t"))).head().getDouble(0)
      val corr = math.sqrt(math.max(meanRhoSS, 0.0))
      UncertaintyReport(name, n, bias = Double.NaN, rms,
        uncorrelated = uncorr, correlated = corr,
        total = math.sqrt(uncorr * uncorr + corr * corr))
    }
    sigmaB.unpersist()
    rows.toDF()
  }
}

/** The reference's ~30-attribute result block reduced to its load-bearing
  * fields (RegionalUncertaintyEstimator storage,
  * variography_uncertainty.py:1147–1166). */
case class UncertaintyReport(
    polygon: String, nPixels: Long, bias: Double, rms: Double,
    uncorrelated: Double, correlated: Double, total: Double)
