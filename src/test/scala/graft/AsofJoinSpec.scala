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
}
