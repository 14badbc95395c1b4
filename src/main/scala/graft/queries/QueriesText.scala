package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text / dedup / fingerprint operators — filled in incrementally. */
object QueriesText {
  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map()
  val oracle: Map[String, String] = Map()
}
