package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Canon.round
import graft.queries._

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  * Queries are grouped by operator family; each family object carries the
  * Spark pipelines and their lockstep DuckDB oracle SQL.
  */
object SparkEntry {

  /** Flagship: the SURVEY.md §7.2-step-2 minimum slice on sf0.001 —
    * two derived rasters → grid-aligned difference join → stable-area
    * spatial filter → median bias + RMS/√N uncorrelated uncertainty
    * (differencing_functions.py:2473–2475; notebook cell 74;
    * variography_uncertainty.py:1544–1552). */
  def entry(spark: SparkSession): DataFrame = {
    import graft.raster.PixelGrid
    val dir = "/root/testdata/sf0.001"
    val a = PixelGrid.grid(spark, dir, 0)
    val b = PixelGrid.grid(spark, dir, 1)
    val dz = PixelGrid.difference(a, b)
      .withColumn("x", col("col") + 0.5).withColumn("y", col("row") + 0.5)
    dz.filter(col("x").between(8.2, 119.8) && col("y").between(8.2, 60.4))
      .agg(count(lit(1)).as("n"),
        round(percentile(col("dz"), lit(0.5)), 6).as("bias_median"),
        round(sqrt(avg(col("dz") * col("dz"))), 6).as("rms"))
      .select(col("n"), col("bias_median"), col("rms"),
        round(col("rms") / sqrt(col("n")), 6).as("uncorrelated"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.queries ++ QueriesRaster.queries ++ QueriesVario.queries ++
      QueriesText.queries ++ QueriesAnn.queries ++ QueriesStream.queries ++
      QueriesIngest.queries ++ QueriesExt.queries ++ QueriesExt2.queries ++
      QueriesMl.queries ++ QueriesSql.queries ++ QueriesPipe.queries

  /** Equivalent ANSI SQL per query, runnable by DuckDB on the same
    * parquet tables. `round(e, d)` is canonicalized into the cross-engine
    * floor form on the way out (graft.functions.Canon). */
  def oracleSql: Map[String, String] =
    (QueriesCore.oracle ++ QueriesRaster.oracle ++ QueriesVario.oracle ++
      QueriesText.oracle ++ QueriesAnn.oracle ++ QueriesStream.oracle ++
      QueriesIngest.oracle ++ QueriesExt.oracle ++ QueriesExt2.oracle ++
      QueriesMl.oracle ++ QueriesSql.oracle ++ QueriesPipe.oracle)
      .map { case (k, v) => k -> graft.functions.Canon.fixSqlRounds(v) }
}
