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
    require(nSalts > 0, s"nSalts must be positive, got $nSalts")
    // Rand.mix needs a non-negative key: pmod the (possibly negative)
    // uniq into range and null-coalesce a failed cast — otherwise the
    // salt lands outside [0, nSalts) and those big-side rows silently
    // vanish from the inner join.
    val uniqKey = pmod(coalesce(col(uniq).cast("long"), lit(0L)), lit(Rand.M))
    val saltedBig = big.withColumn("_salt",
      pmod(Rand.mix(uniqKey, 997), lit(nSalts.toLong)).cast("int"))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1)).cast("array<int>")))
    saltedBig.join(saltedSmall, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
