package graft

import org.apache.spark.sql.functions._
import graft.functions.MomentsAgg

class MomentsAggSpec extends SparkSuite {
  import spark.implicits._

  test("single-pass moments match built-ins on a well-conditioned column") {
    val df = Tables.lineitem(spark, sf001)
      .select(($"l_extendedprice" / 1000.0).as("v"))
    val m = df.select(udaf(MomentsAgg).apply($"v").as("m"))
      .select($"m.*").head()
    val ref = df.agg(count(lit(1)), avg("v"), var_pop($"v"),
      skewness($"v"), kurtosis($"v")).head()
    assert(m.getAs[Long]("n") == ref.getLong(0))
    assert(math.abs(m.getAs[Double]("mean") - ref.getDouble(1)) < 1e-9)
    assert(math.abs(m.getAs[Double]("variance") - ref.getDouble(2)) < 1e-6)
    assert(math.abs(m.getAs[Double]("skewness") - ref.getDouble(3)) < 1e-6)
    assert(math.abs(m.getAs[Double]("kurtosis") - ref.getDouble(4)) < 1e-4)
  }

  test("stays accurate where power sums cancel (large offset)") {
    // values ~1e9 with variance 1: power-sum kurtosis loses ~36 bits
    val base = 1e9
    val df = spark.range(100000)
      .select((graft.rng.Rand.gaussian($"id", 99) + base).as("v"))
    val m = df.select(udaf(MomentsAgg).apply($"v").as("m")).select($"m.*").head()
    assert(math.abs(m.getAs[Double]("variance") - 1.0) < 0.02,
      s"variance ${m.getAs[Double]("variance")}")
    assert(math.abs(m.getAs[Double]("skewness")) < 0.05)
    assert(math.abs(m.getAs[Double]("kurtosis")) < 0.1)
  }
}
