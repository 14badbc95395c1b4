package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewJoin

class SkewJoinSpec extends SparkSuite {
  import spark.implicits._

  test("salted join equals plain join and spreads the hot key") {
    // 100k rows, 90% on one hot key
    val big = spark.range(100000).select(col("id"),
      when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"))
    val small = Seq((7L, "hot"), (0L, "cold"), (50L, "cold")).toDF("k", "label")

    val plain = big.join(small, Seq("k"), "inner")
    val salted = SkewJoin.saltedJoin(big, small, "k", "id", 16)
    assert(salted.count() == plain.count())
    assert(salted.select(sum("id")).head().getLong(0) ==
      plain.select(sum("id")).head().getLong(0))

    // the hot key's rows hash to many distinct salts
    val spread = big.filter(col("k") === 7)
      .select((graft.rng.Rand.mix(col("id"), 997) % 16).as("s"))
      .distinct().count()
    assert(spread == 16, s"hot key spread over $spread salts")
  }
}
