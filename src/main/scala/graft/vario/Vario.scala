package graft.vario

import graft.functions.CacheRegistry.Shareable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Canon.round
import graft.Tables
import graft.rng.Rand

/** Variography pipeline (SURVEY.md §2.3 band join, §2.4 binning, §2.7
  * sampling) — the Spark re-expression of the reference's Numba kernel
  * `bin_distances_and_squared_differences` (variography_uncertainty.py:
  * 364–431) + `compute_matheron` (:433–442) + the cross-run reduction
  * (:516–555).
  *
  * Scale design: the O(M²) pair space never reaches the planner as a
  * cartesian product. Samples are assigned to square cells of side `maxLag`;
  * one side of the self-join is exploded to its 3×3 neighbor cells and the
  * join is a plain equi-join on the cell key (SURVEY.md §4) — every pair
  * within `maxLag` falls in adjacent cells, found exactly once after the
  * `k1 < k2` dedup. Shuffle volume is O(M·9), pair enumeration happens
  * inside the join, and partial aggregation collapses pairs to (run, bin)
  * immediately — nothing pair-sized is ever materialized or shuffled.
  */
object Vario {

  /** Deterministic 2-D sample points derived from `customer`: position from
    * the counter RNG, value = acctbal/1000. Field is 1000×1000 m. */
  def points(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey").as("k"),
      (Rand.mix(col("c_custkey"), 1) % 1000).cast("double") + 0.5 as "x",
      (Rand.mix(col("c_custkey"), 2) % 1000).cast("double") + 0.5 as "y",
      round(col("c_acctbal") / 1000.0, 6).as("v"))
      .persistShared() // shared across the variogram/uncertainty query family

  def pointsSql: String =
    s"""SELECT c_custkey AS k,
        CAST((${Rand.mixSql("c_custkey", 1)}) % 1000 AS DOUBLE) + 0.5 AS x,
        CAST((${Rand.mixSql("c_custkey", 2)}) % 1000 AS DOUBLE) + 0.5 AS y,
        round(c_acctbal / 1000.0, 6) AS v
        FROM customer"""

  /** Seeded multi-run sample WITHOUT replacement: per run, the `k` points
    * with lowest counter-hash rank (`sample_raster`,
    * variography_uncertainty.py:160–219; run spawning :512–527). */
  def multiRunSample(pts: DataFrame, nRuns: Int, sampleSize: Int): DataFrame = {
    // run is long: the oracle's unnest(range(n)) yields BIGINT and the two
    // engines' outputs must serialize as the same physical type
    val runs = pts.withColumn("run",
      explode(sequence(lit(0L), lit(nRuns - 1L))))
      .withColumn("h", Rand.mix(col("k") * nRuns + col("run"), 100))
    val w = Window.partitionBy("run").orderBy("h", "k")
    runs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= sampleSize)
      .select("run", "k", "x", "y", "v")
  }

  def multiRunSampleSql(ptsCte: String, nRuns: Int, sampleSize: Int): String =
    s"""SELECT run, k, x, y, v FROM (
        SELECT p.*, r.run,
               row_number() OVER (PARTITION BY r.run
                 ORDER BY (${Rand.mixSql(s"k * $nRuns + r.run", 100)}), k) AS rn
        FROM ($ptsCte) p, (SELECT unnest(range($nRuns)) AS run) r) s
        WHERE rn <= $sampleSize"""

  /** All i<j pairs within `maxLag`, via the neighbor-cell band join.
    * Output: run, d2 (squared distance, exact integer-valued), dv. */
  def bandPairs(sample: DataFrame, maxLag: Double): DataFrame = {
    val L = maxLag
    val s1 = sample
      .withColumn("o", explode(array((for (dx <- -1 to 1; dy <- -1 to 1)
        yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)))
      .select(col("run"), col("k").as("k1"), col("x").as("x1"),
        col("y").as("y1"), col("v").as("v1"),
        (floor(col("x") / L) + col("o.dx")).as("cx"),
        (floor(col("y") / L) + col("o.dy")).as("cy"))
    val s2 = sample.select(col("run").as("run2"), col("k").as("k2"),
      col("x").as("x2"), col("y").as("y2"), col("v").as("v2"),
      floor(col("x2") / L).as("cx"), floor(col("y2") / L).as("cy"))
    s1.join(s2, s1("run") === s2("run2") && s1("cx") === s2("cx") &&
        s1("cy") === s2("cy") && s1("k1") < s2("k2"))
      .select(col("run"),
        // plain multiplication, not pow(): d2 must be exactly integer-valued
        // so bin-edge and max-lag comparisons are bit-identical to the oracle
        ((col("x2") - col("x1")) * (col("x2") - col("x1")) +
         (col("y2") - col("y1")) * (col("y2") - col("y1"))).as("d2"),
        (col("v2") - col("v1")).as("dv"))
      .filter(col("d2") <= L * L)
  }

  def bandPairsSql(sampleCte: String, maxLag: Double): String =
    s"""SELECT s1.run,
          ((s2.x - s1.x) * (s2.x - s1.x) + (s2.y - s1.y) * (s2.y - s1.y)) AS d2,
          (s2.v - s1.v) AS dv
        FROM (SELECT s.*, floor(s.x / $maxLag) + dx AS cx,
                     floor(s.y / $maxLag) + dy AS cy
              FROM ($sampleCte) s,
                   (SELECT unnest([-1,0,1]) AS dx),
                   (SELECT unnest([-1,0,1]) AS dy)) s1
        JOIN (SELECT s.*, floor(s.x / $maxLag) AS cx, floor(s.y / $maxLag) AS cy
              FROM ($sampleCte) s) s2
          ON s1.run = s2.run AND s1.cx = s2.cx AND s1.cy = s2.cy AND s1.k < s2.k
        WHERE ((s2.x - s1.x) * (s2.x - s1.x) + (s2.y - s1.y) * (s2.y - s1.y)) <= ${maxLag * maxLag}"""

  /** Matheron semivariance per (run, bin): γ = Σ(Δv)² / (2n), bins of
    * `binWidth`, bins with n < minPairs dropped (MIN_PAIRS=10,
    * variography_uncertainty.py:325, 433–442). */
  def matheron(pairs: DataFrame, binWidth: Double, minPairs: Int = 10): DataFrame =
    pairs
      .groupBy(col("run"), floor(sqrt(col("d2")) / binWidth).cast("int").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("dv") * col("dv")).as("ssd"))
      .filter(col("n") >= minPairs)
      .select(col("run"), col("bin"), col("n"),
        round(col("ssd") / (col("n") * 2.0), 6).as("gamma"))

  def matheronSql(pairsCte: String, binWidth: Double, minPairs: Int = 10): String =
    s"""SELECT run, CAST(floor(sqrt(d2) / $binWidth) AS INT) AS bin,
          count(*) AS n, round(sum(dv * dv) / (count(*) * 2.0), 6) AS gamma
        FROM ($pairsCte) GROUP BY 1, 2 HAVING count(*) >= $minPairs"""

  /** Cross-run reduction per bin: mean γ, spread = (p97.5 − p2.5)/2, mean
    * pair count, std of γ (`calculate_mean_variogram_numba`,
    * variography_uncertainty.py:516–555). */
  def crossRunReduce(gammas: DataFrame): DataFrame =
    gammas.groupBy("bin").agg(
      round(avg("gamma"), 6).as("mean_gamma"),
      round((percentile(col("gamma"), lit(0.975)) -
             percentile(col("gamma"), lit(0.025))) / 2.0, 6).as("spread"),
      round(avg("n"), 6).as("mean_n"),
      round(stddev_pop("gamma"), 6).as("std_gamma"))

  def crossRunReduceSql(gammasCte: String): String =
    s"""SELECT bin, round(avg(gamma), 6) AS mean_gamma,
          round((quantile_cont(gamma, 0.975) - quantile_cont(gamma, 0.025)) / 2.0, 6) AS spread,
          round(avg(n), 6) AS mean_n,
          round(stddev_pop(gamma), 6) AS std_gamma
        FROM ($gammasCte) GROUP BY 1"""
}
