package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.streaming.{StatefulSessions, StreamOps}

/** flatMapGroupsWithState sessionization must produce the same sessions
  * as the declarative session_window path. A far-future sentinel event
  * advances the watermark in a second micro-batch so EventTimeTimeout
  * flushes the still-open sessions. */
class StatefulSessionSpec extends SparkSuite {
  import spark.implicits._

  test("stateful sessionization equals session_window on the same data") {
    val batch = StreamOps.sessionize(Tables.events(spark, sf001))
      .orderBy("user_id", "session_start").collect()

    val dir = Files.createTempDirectory("graft-fmgws").toFile
    dir.deleteOnExit()
    Files.copy(Paths.get(s"$sf001/events.parquet"),
      Paths.get(dir.getAbsolutePath, "part-000.parquet"))

    val schema = spark.read.parquet(dir.getAbsolutePath).schema
    val raw = spark.readStream.schema(schema).parquet(dir.getAbsolutePath)
    val evs =
      (if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw)
        .select(col("user_id"), col("ts"), col("value"))
        .as[StatefulSessions.Ev]

    val q = StatefulSessions.sessionizeStateful(evs)
      .writeStream.outputMode("append")
      .format("memory").queryName("fmgws_test").start()
    try {
      q.processAllAvailable()
      // sentinel far in the future (user -1) advances the watermark so
      // open sessions time out in the next micro-batch
      val maxTs = Tables.events(spark, sf001).agg(max("ts")).head()
        .getTimestamp(0).getTime
      Tables.events(spark, sf001).limit(1)
        .select(lit(-1L).as("user_id"),
          timestamp_millis(lit(maxTs + 6 * 3600 * 1000L)).as("ts"),
          lit(0.0).as("value"),
          lit(0L).as("event_id"), lit("x").as("event_type"), lit("{}").as("props"))
        .select(schema.fieldNames.map {
          case "ts" if schema("ts").dataType == org.apache.spark.sql.types.LongType =>
            (unix_micros(col("ts")) * 1000).as("ts")
          case f => col(f)
        }: _*)
        .write.mode("append").parquet(dir.getAbsolutePath)
      q.processAllAvailable()
      q.processAllAvailable()
      val streamed = spark.table("fmgws_test")
        .filter(col("user_id") >= 0)
        .select(col("user_id"), col("session_start"),
          col("n_events"), round(col("sum_value") * 1e6).cast("long").as("sv6"))
        .orderBy("user_id", "session_start").collect()
      val batchCmp = StreamOps.sessionize(Tables.events(spark, sf001))
        .select(col("user_id"), col("session_start"), col("n_events"),
          round(col("sum_value") * 1e6).cast("long").as("sv6"))
        .orderBy("user_id", "session_start").collect()
      assert(streamed.length == batchCmp.length,
        s"rows ${streamed.length} vs ${batchCmp.length}")
      streamed.zip(batchCmp).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    } finally q.stop()
  }
}
