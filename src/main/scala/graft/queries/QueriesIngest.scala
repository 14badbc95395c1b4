package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ingest.PointCloud

/** Ingest-lifecycle operators (SURVEY.md §3.1): point-cloud →
  * classification filters → DEM gridding, plus distinct-count surfaces.
  */
object QueriesIngest {
  type Q = (SparkSession, String) => DataFrame

  // §3.1 / §2.1: LAS-like points → noise drop → DTM/DSM cells
  private val pointcloudGrid: Q = (s, d) =>
    PointCloud.gridDem(PointCloud.points(s, d))
  private val pointcloudGridSql =
    PointCloud.gridDemSql(PointCloud.pointsSql)

  // §2.4 distinct counting (engine surface; exact form is oracle-gated,
  // approx_count_distinct is the 100-TB path — same query shape)
  private val countDistinctQ: Q = (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
  private val countDistinctSql =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
              count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
       FROM lineitem GROUP BY 1"""

  val queries: Map[String, Q] = Map(
    "i_pointcloud_grid" -> pointcloudGrid,
    "a_count_distinct" -> countDistinctQ,
  )

  val oracle: Map[String, String] = Map(
    "i_pointcloud_grid" -> pointcloudGridSql,
    "a_count_distinct" -> countDistinctSql,
  )
}
