package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.rng.Rand

/** Skew-aware equi-join by key salting (ARCHITECTURE.md; the manual
  * companion to AQE's runtime skew-join splitting, for plans AQE can't
  * rewrite — e.g. when the skewed side feeds an aggregation that must
  * stay co-partitioned).
  *
  * The big side's key is extended with a deterministic salt in
  * [0, nSalts); the small side is replicated once per salt value. A hot
  * key's rows then spread over `nSalts` reducers instead of one. Salt
  * assignment uses the counter RNG over a uniqueness column so results
  * are reproducible run-to-run.
  */
object SkewJoin {

  /** Inner equi-join of `big ⋈ small` on `key`, salted `nSalts` ways.
    * `uniq` is any column of `big` that distinguishes rows (drives the
    * deterministic salt). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 uniq: String, nSalts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      (Rand.mix(col(uniq).cast("long"), 997) % nSalts).cast("int"))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1)).cast("array<int>")))
    saltedBig.join(saltedSmall, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
