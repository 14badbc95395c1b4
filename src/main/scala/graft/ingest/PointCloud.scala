package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Canon.round
import graft.Tables
import graft.rng.Rand

/** Point-cloud → DEM gridding, the reference's ingest workflow
  * (differencing_functions.py:1649–1764 via PDAL: crop → noise drop →
  * ground keep → grid to cells by IDW/mean for DTM, max for DSM).
  * In Spark: classification filters → cell assignment by floor division →
  * one hash aggregation per product. At 100 TB of points this is a single
  * shuffle on the cell key, identical in shape to the reference's
  * streaming PDAL pass but horizontally parallel.
  *
  * The synthetic point cloud is derived deterministically from `orders`:
  * position/elevation/class from the counter RNG, mirroring the LAS
  * dimensions the reference touches (x, y, z, classification).
  */
object PointCloud {

  /** Deterministic LAS-like point table: ~rows(orders) points over a
    * 64×64 m field; classification 2=ground (60%), 1=unclassified (30%),
    * 7/18=noise (10%). */
  def points(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val cls = Rand.mix(col("o_orderkey"), 83) % 10
    o.select(
      (Rand.u01(col("o_orderkey"), 81) * 64.0).as("x"),
      (Rand.u01(col("o_orderkey"), 82) * 64.0).as("y"),
      round(Rand.u01(col("o_orderkey"), 84) * 30.0 + 100.0, 6).as("z"),
      when(cls < 6, 2).when(cls < 9, 1)
        .when(cls === lit(9L), 7).otherwise(18).cast("int").as("classification"))
  }

  def pointsSql: String = {
    val cls = s"(${Rand.mixSql("o_orderkey", 83)}) % 10"
    s"""SELECT ${Rand.u01Sql("o_orderkey", 81)} * 64.0 AS x,
          ${Rand.u01Sql("o_orderkey", 82)} * 64.0 AS y,
          round(${Rand.u01Sql("o_orderkey", 84)} * 30.0 + 100.0, 6) AS z,
          CAST(CASE WHEN $cls < 6 THEN 2 WHEN $cls < 9 THEN 1
                    WHEN $cls = 9 THEN 7 ELSE 18 END AS INT) AS classification
        FROM orders"""
  }

  /** DTM: drop noise classes (7, 18), keep ground (2), mean-z per 1 m
    * cell. DSM: drop noise only, max-z per cell. Both in one pass via
    * conditional aggregates. The mean accumulates integer-scaled z
    * (6-decimal values × 1e6) so partial sums are exact and
    * order-independent across engines (same pattern as the IDW fill). */
  def gridDem(pts: DataFrame): DataFrame = {
    val z6 = floor(col("z") * 1e6 + 0.5).cast("long")
    val ground = col("classification") === 2
    pts.filter(!col("classification").isin(7, 18))
      .groupBy(floor(col("x")).cast("int").as("col"),
               floor(col("y")).cast("int").as("row"))
      .agg(
        count(lit(1)).as("n_points"),
        round(sum(when(ground, z6)).cast("double") /
          (count(when(ground, lit(1))).cast("double") * 1e6), 6).as("dtm_z"),
        round(max(col("z")), 6).as("dsm_z"))
  }

  def gridDemSql(ptsCte: String): String =
    s"""SELECT CAST(floor(x) AS INT) AS col, CAST(floor(y) AS INT) AS "row",
          count(*) AS n_points,
          round(CAST(sum(CASE WHEN classification = 2
                              THEN CAST(floor(z * 1000000.0 + 0.5) AS BIGINT) END) AS DOUBLE)
                / (CAST(count(CASE WHEN classification = 2 THEN 1 END) AS DOUBLE)
                   * 1000000.0), 6) AS dtm_z,
          round(max(z), 6) AS dsm_z
        FROM ($ptsCte) WHERE classification NOT IN (7, 18)
        GROUP BY 1, 2"""
}
