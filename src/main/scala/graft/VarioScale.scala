package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rng.Rand
import graft.vario.Vario

/** Scale probe for the variogram neighbor-cell band join (SURVEY.md §2.3;
  * the reference's hottest kernel, variography_uncertainty.py:364–431).
  *
  * The oracle gates run the join at fixture M; this main runs it at the
  * realistic sampling sizes a 100-TB survey would produce (M = 1e5–1e6
  * points in ONE run) and proves the near-linear shape: the pair space is
  * enumerated inside a cell-key equi-join (shuffle volume O(M·9)), so wall
  * should scale ~linearly in M at constant point density — where a
  * broadcast-nested-loop formulation would be O(M²).
  *
  * Density is held constant across M (field side grows as sqrt(M)) because
  * that is the physical situation: a larger survey covers more area at the
  * same ground-sample distance. Expected in-range neighbors per point
  * n ≈ d·π·L² is the same at every M, so pairs ≈ M·n/2 grows linearly.
  *
  * Usage: runMain graft.VarioScale [M1,M2,...] [runs]
  * (default 100000,1000000 at runs=1; the reference's canonical
  * analysis is runs=30 — `VarioScale 1000000 30` is the real pair
  * workload, ≈1.5×10⁹ in-range pairs). Prints one line per M: M, runs,
  * field side, pairs, bins, wall seconds, and the join operators found
  * in the physical plan (must contain a shuffled equi-join and must NOT
  * contain BroadcastNestedLoop / Cartesian).
  */
object VarioScale {
  /** M deterministic points PER RUN at density `d` pts/unit² (field side
    * √(M/d)), `runs` independent realizations (distinct hash-drawn
    * positions per run — the reference's canonical analysis is 30,
    * BASELINE n_runs). Value = a smooth function of position + hash
    * noise, so the variogram has real structure rather than pure nugget.
    * The band join keys on (run, cx, cy): runs never cross-pair, so the
    * pair space is runs × the single-run workload. */
  def points(spark: SparkSession, m: Long, d: Double,
             runs: Long = 1L): DataFrame = {
    val side = math.sqrt(m / d)
    // integer-lattice-free positions: two independent hash draws in [0, side)
    spark.range(m * runs).select(
      (col("id") / m).cast("long").as("run"),
      col("id").as("k"),
      (Rand.mix(col("id"), 11).cast("double") / Rand.M * side).as("x"),
      (Rand.mix(col("id"), 12).cast("double") / Rand.M * side).as("y"),
      (Rand.mix(col("id"), 13).cast("double") / Rand.M).as("v"))
      .withColumn("v", sin(col("x") / 50.0) * cos(col("y") / 50.0) + col("v") * 0.1)
  }

  def main(args: Array[String]): Unit = {
    val ms = (if (args.nonEmpty) args(0) else "100000,1000000")
      .split(",").map(_.trim.toLong)
    val runs = if (args.length > 1) args(1).toLong else 1L
    val density = 0.02  // pts/unit² → n ≈ d·π·L² ≈ 100 neighbors at L=40
    val maxLag = 40.0
    val spark = Sessions.builder("local[32]", "64")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (m <- ms) {
      val pts = points(spark, m, density, runs)
      val pairs = Vario.bandPairs(pts, maxLag)
      // minPairs=1: Σn over all bins is the exact within-maxLag pair count,
      // so the probe measures the full pipeline (join + binning) in one job
      val gam = Vario.matheron(pairs, binWidth = 5.0, minPairs = 1)
      val plan = gam.queryExecution.executedPlan.toString
      val joinOps = plan.linesIterator
        .filter(l => l.contains("Join") || l.contains("Cartesian"))
        .map(_.trim.takeWhile(_ != '[')).toSeq.distinct
      require(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
        s"band join degenerated to a pair-space product at M=$m:\n$plan")
      val t0 = System.nanoTime()
      val rows = gam.select(sum("n").as("pairs"), count(lit(1)).as("bins"),
        round(avg("gamma"), 4).as("mean_gamma")).collect()(0)
      val wall = (System.nanoTime() - t0) / 1e9
      val side = math.sqrt(m / density)
      println(f"VARIO_SCALE M=$m%d runs=$runs%d side=$side%.0f pairs=${rows.getLong(0)}%d " +
        f"bins=${rows.getLong(1)}%d mean_gamma=${rows.getDouble(2)}%.4f " +
        f"wall=$wall%.1f join=${joinOps.mkString("|")}")
    }
    spark.stop()
  }
}
