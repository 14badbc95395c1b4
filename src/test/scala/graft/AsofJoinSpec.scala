package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.AsofJoin

class AsofJoinSpec extends SparkSuite {
  import spark.implicits._

  test("asof equals the brute-force range-join + argmax definition") {
    val ev = Tables.events(spark, sf001)
    val probes = ev.filter(col("event_id") % 53 === 0)
      .select(col("event_id"), col("user_id"), col("ts"))
    val markers = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("mark"))

    val fast = AsofJoin.asof(probes, markers, "user_id", "ts", Seq("mark"))
      .orderBy("event_id").collect()

    // brute force: range join, keep latest marker per probe
    val brute = probes.as("l")
      .join(markers.as("r"),
        col("l.user_id") === col("r.user_id") && col("r.ts") <= col("l.ts"),
        "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("l.event_id"))
          .orderBy(col("r.ts").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("l.event_id"), col("l.user_id"), col("l.ts"),
        col("r.ts").as("asof_ts"), col("r.mark").as("asof_mark"))
      .orderBy("event_id").collect()

    assert(fast.length == brute.length)
    fast.zip(brute).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    // some probes must actually have matched — otherwise the test is vacuous
    assert(fast.count(_.getAs[Any]("asof_mark") != null) > 0)
  }

  test("asof at an exactly-equal timestamp matches inclusively") {
    val left = Seq((1L, 10L, java.sql.Timestamp.valueOf("2020-01-01 10:00:00")))
      .toDF("id", "k", "ts")
    val right = Seq(
      (10L, java.sql.Timestamp.valueOf("2020-01-01 10:00:00"), 7.0),
      (10L, java.sql.Timestamp.valueOf("2020-01-01 09:00:00"), 3.0))
      .toDF("k", "ts", "pay")
    val out = AsofJoin.asof(left, right, "k", "ts", Seq("pay")).collect()
    assert(out.length == 1 && out.head.getAs[Double]("asof_pay") == 7.0)
  }

  test("left rows before any right row keep nulls") {
    val left = Seq((1L, 10L, java.sql.Timestamp.valueOf("2020-01-01 08:00:00")))
      .toDF("id", "k", "ts")
    val right = Seq(
      (10L, java.sql.Timestamp.valueOf("2020-01-01 09:00:00"), 3.0))
      .toDF("k", "ts", "pay")
    val out = AsofJoin.asof(left, right, "k", "ts", Seq("pay")).collect()
    assert(out.length == 1 && out.head.isNullAt(out.head.fieldIndex("asof_pay")))
  }

  test("asofNearest picks the closer side; ties and equal ts resolve backward") {
    // left at t=100: right at 90 (d=10) and 105 (d=5) → forward 105
    // left at t=200: right at 195 and 205 (both d=5) → tie → backward 195
    // left at t=300: right exactly at 300 → d=0 backward
    // left at t=10:  only later rights exist → forward fallback
    val left = Seq((1L, 7L, 100L), (2L, 7L, 200L), (3L, 7L, 300L),
      (4L, 7L, 10L)).toDF("id", "k", "us")
    val right = Seq((7L, 90L, 1.0), (7L, 105L, 2.0), (7L, 195L, 3.0),
      (7L, 205L, 4.0), (7L, 300L, 5.0)).toDF("k", "us", "pay")
    val out = AsofJoin.asofNearest(left, right, "k", "us", Seq("pay"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("near_pay")).toMap
    assert(out == Map(1L -> 2.0, 2L -> 3.0, 3L -> 5.0, 4L -> 1.0))
  }

  test("asofNearest equals the brute-force argmin-|Δt| definition on real data") {
    val ev = Tables.events(spark, sf001)
    val probes = ev.filter(col("event_id") % 53 === 0)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val markers = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .groupBy("user_id", "us").agg(max(col("value")).as("mark"))
    val fast = AsofJoin.asofNearest(probes, markers, "user_id", "us", Seq("mark"))
      .orderBy("event_id").collect()
    val brute = probes.as("l")
      .join(markers.as("r"), col("l.user_id") === col("r.user_id"), "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("l.event_id"))
          .orderBy(abs(col("r.us") - col("l.us")).asc_nulls_last,
            col("r.us").asc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("l.event_id"), col("l.user_id"), col("l.us"),
        col("r.us").as("near_us"), col("r.mark").as("near_mark"))
      .orderBy("event_id").collect()
    assert(fast.length == brute.length)
    fast.zip(brute).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    assert(fast.count(_.getAs[Any]("near_mark") != null) > 0)
  }
}
