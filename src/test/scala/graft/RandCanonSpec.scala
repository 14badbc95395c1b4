package graft

import org.apache.spark.sql.functions._
import graft.functions.Canon
import graft.rng.Rand

class RandCanonSpec extends SparkSuite {
  import spark.implicits._

  test("mix column and mixLong scalar agree") {
    val keys = Seq(0L, 1L, 17L, 123456789L, (1L << 40) + 3)
    val fromCol = keys.toDF("k")
      .select(Rand.mix(col("k"), 7).as("h")).as[Long].collect()
    val fromScalar = keys.map(Rand.mixLong(_, 7))
    assert(fromCol.toSeq == fromScalar)
  }

  test("mix stays in [0, 2^31) and u01 in [0,1)") {
    val hs = spark.range(10000)
      .select(Rand.mix(col("id"), 3).as("h"), Rand.u01(col("id"), 3).as("u"))
      .agg(min("h"), max("h"), min("u"), max("u"))
      .head()
    assert(hs.getLong(0) >= 0 && hs.getLong(1) < Rand.M)
    assert(hs.getDouble(2) >= 0.0 && hs.getDouble(3) < 1.0)
  }

  test("u01 is roughly uniform") {
    val m = spark.range(50000).select(Rand.u01(col("id"), 11).as("u"))
      .agg(avg("u")).head().getDouble(0)
    assert(math.abs(m - 0.5) < 0.01, s"mean $m")
  }

  test("gaussian draws have ~N(0,1) moments") {
    val r = spark.range(50000).select(Rand.gaussian(col("id"), 5).as("z"))
      .agg(avg("z"), stddev_pop(col("z"))).head()
    assert(math.abs(r.getDouble(0)) < 0.02)
    assert(math.abs(r.getDouble(1) - 1.0) < 0.02)
  }

  test("fixSqlRounds rewrites simple and nested rounds") {
    assert(Canon.fixSqlRounds("round(x, 2)") ==
      "(floor((x) * 100.0 + 0.5) / 100.0)")
    val nested = Canon.fixSqlRounds("round(avg(round(v, 6)), 2) AS a")
    assert(!nested.contains("round("))
    assert(nested ==
      "(floor((avg((floor((v) * 1000000.0 + 0.5) / 1000000.0))) * 100.0 + 0.5) / 100.0) AS a")
    // identifiers merely ending in "round(" are not rewritten
    assert(Canon.fixSqlRounds("ground(x, 2)") == "ground(x, 2)")
  }

  test("canonical round matches plain decimal expectations") {
    val r = Seq(1.2345649, 1.2345651, -2.5000004)
      .toDF("x").select(Canon.round(col("x"), 6).as("r")).as[Double].collect()
    assert(r(0) == 1.234565 && r(1) == 1.234565)
    assert(r(2) == -2.5)
  }
}
