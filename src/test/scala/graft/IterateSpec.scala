package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Iterate

class IterateSpec extends SparkSuite {
  import spark.implicits._

  // tiny undirected co-purchase-shaped graph: 6 nodes, symmetric edges
  private def contrib: DataFrame = {
    val pairs = Seq((0, 1), (0, 3), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    edges.join(deg, "src")
  }

  private def prStep(c: DataFrame)(r: DataFrame): DataFrame =
    c.join(r, "src")
      .select(col("dst"),
        floor(lit(1e9) * (col("r") / col("deg").cast("double")))
          .cast("long").as("c"))
      .groupBy("dst").agg(sum("c").as("s"))
      .select(col("dst").as("src"),
        (lit(0.15) + lit(0.85) * (col("s").cast("double") / 1e9)).as("r"))

  private def r0: DataFrame =
    contrib.select("src").distinct().withColumn("r", lit(1.0))

  private def ranks(df: DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getAs[Any]("src").toString.toLong ->
      r.getAs[Double]("r")).toMap

  test("eps = 0 reproduces the fixed-round iterate exactly (gate path)") {
    val fixed = Iterate.untilDelta(r0, 6, eps = 0.0)(prStep(contrib))
    assert(fixed.rounds == 6)
    // reference: hand-rolled foldLeft of the same step
    val manual = (1 to 6).foldLeft(r0)((r, _) => prStep(contrib)(r))
    assert(ranks(fixed.result) == ranks(manual))
  }

  test("early exit at eps returns EXACTLY the fixed-rounds-when-converged result") {
    // run with a loose eps: converges well before maxRounds
    val fp = Iterate.untilDelta(r0, 50, eps = 1e-6)(prStep(contrib))
    assert(fp.rounds < 50, s"expected early exit, ran ${fp.rounds}")
    assert(fp.lastDelta < 1e-6)
    // the early-exit result must equal running exactly fp.rounds fixed rounds
    val manual = (1 to fp.rounds).foldLeft(r0)((r, _) => prStep(contrib)(r))
    assert(ranks(fp.result) == ranks(manual))
    // and further rounds no longer change the 6-dp values the gate reads
    val more = (1 to 4).foldLeft(fp.result)((r, _) => prStep(contrib)(r))
    val a = ranks(fp.result).map { case (k, v) => k -> math.rint(v * 1e6) }
    val b = ranks(more).map { case (k, v) => k -> math.rint(v * 1e6) }
    assert(a == b, "converged iterate moved at 6 dp after more rounds")
  }

  test("maxRounds caps a non-converging eps and reports the last delta") {
    val fp = Iterate.untilDelta(r0, 3, eps = 1e-300)(prStep(contrib))
    assert(fp.rounds == 3)
    assert(fp.lastDelta > 0 || fp.lastDelta.isNaN)
  }
}
