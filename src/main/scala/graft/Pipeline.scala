package graft

import graft.functions.CacheRegistry.Shareable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.api.ErrorAnalysis
import graft.raster.{GridMeta, PixelGrid}

/** Demo main: the full reference workflow over the derived raster pair —
  * difference → stable-ground bias (+bootstrap) → debias → multi-run
  * variogram → spherical fit (AIC search) → per-polygon uncertainty.
  * `runMain graft.Pipeline [sfDir]`.
  */
object Pipeline {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.local("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val meta = GridMeta(width = PixelGrid.W, height = PixelGrid.W)
    val ea = new ErrorAnalysis(spark, meta)
    val dz = ea.difference(
      PixelGrid.grid(spark, dir, 0), PixelGrid.grid(spark, dir, 1)).persistShared()

    val stableWkt = "POLYGON ((4.2 4.2, 60.4 4.2, 60.4 123.7, 4.2 123.7))"
    val (bias, biasUnc) = ea.biasOverStable(dz, stableWkt)
    println(f"bias=$bias%.6f ± $biasUnc%.6f (median over stable, bootstrap std)")

    val debiased = ea.removeBias(dz, bias)
    val binW = 8.0
    val cross = ea.empiricalVariogram(debiased, nRuns = 4, sampleSize = 600,
      maxLag = 64.0, binWidth = binW)
    val best = ea.fitModel(cross, binW)
    println(s"model: sills=${best.model.sills.map(s => f"$s%.4f")} " +
      s"ranges=${best.model.ranges.map(r => f"$r%.1f")} " +
      f"nugget=${best.model.nugget}%.4f aic=${best.aic}%.1f " +
      s"(k=${best.nComponents}, nugget=${best.hasNugget})")

    val fois = Seq(
      "east_rect" -> "POLYGON ((68.3 4.2, 123.7 4.2, 123.7 123.7, 68.3 123.7))",
      "mid_diamond" -> "POLYGON ((64.3 34.1, 94.5 64.3, 64.3 94.5, 34.1 64.3))")
    ea.uncertainty(debiased, fois, best.model).show(false)
    spark.stop()
  }
}
