package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.streaming.StreamOps

/** Streaming-compatible windowed aggregations (SURVEY.md §2.10), oracle-
  * checked in batch mode over the static `events` table. The identical
  * transforms run under Structured Streaming in StreamSpec. */
object QueriesStream {
  type Q = (SparkSession, String) => DataFrame

  private val hourly: Q = (s, d) => StreamOps.hourlyAgg(Tables.events(s, d))
  private val sliding: Q = (s, d) => StreamOps.slidingRms(Tables.events(s, d))
  private val sessions: Q = (s, d) => StreamOps.sessionize(Tables.events(s, d))
  private val dedupFirst: Q = (s, d) =>
    StreamOps.dedupKeepFirst(Tables.events(s, d))

  private val hourlyUsers: Q = (s, d) =>
    StreamOps.hourlyUsers(Tables.events(s, d))

  private val hllUsers: Q = (s, d) =>
    StreamOps.hllUsers(Tables.events(s, d))

  val queries: Map[String, Q] = Map(
    "st_hourly_users" -> hourlyUsers,
    "st_hll_users" -> hllUsers,
    "st_hourly_window" -> hourly,
    "st_sliding_rms" -> sliding,
    "st_sessionize" -> sessions,
    "st_dedup_first" -> dedupFirst,
  )

  val oracle: Map[String, String] = Map(
    "st_hourly_users" -> StreamOps.hourlyUsersSql,
    "st_hll_users" -> StreamOps.hllUsersSql,
    "st_hourly_window" -> StreamOps.hourlyAggSql,
    "st_sliding_rms" -> StreamOps.slidingRmsSql,
    "st_sessionize" -> StreamOps.sessionizeSql,
    "st_dedup_first" -> StreamOps.dedupKeepFirstSql,
  )
}
