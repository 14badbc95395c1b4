package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet corpus (TESTDATA.md).
  * Every query takes `(spark, sfDir)` and reads only these tables, so the
  * same query runs unchanged at sf0.001 / 0.01 / 0.1 (and, by design, on a
  * partitioned 100-TB layout: all downstream operators are pure DataFrame
  * pipelines with no driver-side materialization of table-sized data).
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The driver's events.parquet has shipped `ts` in two physical forms
    * across corpus generations: TIMESTAMP(NANOS) (no native Spark type —
    * sessions set `spark.sql.legacy.parquet.nanosAsLong` and we rebuild
    * micros via `ts div 1000`, exactly DuckDB's read of the same file) and
    * naive TIMESTAMP(MICROS) (isAdjustedToUTC=false, which Spark 4 infers
    * as TIMESTAMP_NTZ). Both normalize here to a session-UTC TimestampType
    * column so every downstream surface — watermarks, `unix_micros`,
    * `Row.getTimestamp` — sees one type regardless of corpus vintage. The
    * NTZ→TZ cast under the UTC session zone relabels the same wall-clock
    * instant DuckDB reads, so oracle parity is unchanged. */
  private def normTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    case org.apache.spark.sql.types.TimestampNTZType =>
      df.withColumn("ts",
        org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
    case _ => df
  }

  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame     = normTs(t(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
