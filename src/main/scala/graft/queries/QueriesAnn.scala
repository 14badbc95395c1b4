package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Similarity-search / ANN operators — filled in incrementally. */
object QueriesAnn {
  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map()
  val oracle: Map[String, String] = Map()
}
