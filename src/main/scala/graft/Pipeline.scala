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
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.analyzer.failAmbiguousSelfJoin", "false")
      .config(// right-size the generated-class cache: the default 100 entries
        // thrash across a multi-query session (one neighboring query can
        // evict a plan's classes; re-running then pays ~10s of janino+JIT
        // recompilation, not execution -- measured on a_stats11 at sf1:
        // pass-2 14.1s at 100 entries vs 2.2s at 10000)
        "spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
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
