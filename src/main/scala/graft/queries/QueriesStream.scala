package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming-compatible windowed agg operators — filled in incrementally. */
object QueriesStream {
  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map()
  val oracle: Map[String, String] = Map()
}
