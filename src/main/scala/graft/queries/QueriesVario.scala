package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Canon.round
import graft.Tables
import graft.functions.Spherical
import graft.rng.Rand
import graft.vario.Vario

/** Variography + uncertainty-propagation operators (SURVEY.md §2.3 band
  * join, §2.4 binned aggs, §2.7 seeded sampling/bootstrap, §2.9 spherical
  * math). The full reference pipeline: sample → pairwise band join →
  * Matheron binning → cross-run reduction → (driver fit) → Monte-Carlo /
  * analytical / Hugonnet uncertainty.
  */
object QueriesVario {
  type Q = (SparkSession, String) => DataFrame

  private val NRUNS = 5
  private val SAMPLE = 800
  private val MAXLAG = 200.0
  private val BINW = 20.0

  // §2.7 deterministic sample points (position+value from counter RNG)
  private val samplePoints: Q = (s, d) => Vario.points(s, d)
  private val samplePointsSql = Vario.pointsSql

  // §2.7 seeded multi-run sample w/o replacement, reduced per run
  private val multirunSample: Q = (s, d) =>
    Vario.multiRunSample(Vario.points(s, d), NRUNS, SAMPLE)
      .groupBy("run").agg(count(lit(1)).as("n"),
        round(avg("v"), 6).as("mean_v"),
        round(avg("x"), 6).as("mean_x"),
        round(avg("y"), 6).as("mean_y"))
  private val multirunSampleSql =
    s"""SELECT run, count(*) AS n, round(avg(v), 6) AS mean_v,
          round(avg(x), 6) AS mean_x, round(avg(y), 6) AS mean_y
        FROM (${Vario.multiRunSampleSql(Vario.pointsSql, NRUNS, SAMPLE)})
        GROUP BY 1"""

  // §2.3+§2.4 empirical variogram: band join → Matheron per (run, bin)
  private val variogram: Q = (s, d) =>
    Vario.matheron(
      Vario.bandPairs(Vario.multiRunSample(Vario.points(s, d), NRUNS, SAMPLE), MAXLAG),
      BINW)
  private val variogramSql = Vario.matheronSql(
    Vario.bandPairsSql(Vario.multiRunSampleSql(Vario.pointsSql, NRUNS, SAMPLE), MAXLAG),
    BINW)

  // §2.4 cross-run variogram reduction
  private val crossRun: Q = (s, d) => Vario.crossRunReduce(variogram(s, d))
  private val crossRunSql = Vario.crossRunReduceSql(variogramSql)

  // §2.4 bootstrap median distribution: 200 iters × 500 draws w/
  // replacement → median per iter → std + mean of medians
  // (bootstrap_uncertainty_subsample, variography_uncertainty.py:289–316).
  // Fixture sizes: the reference defaults to 1000 iters × 10% of the
  // sample; 200×500 keeps the sf0.01 gate fast with identical semantics —
  // both knobs are plain constants below (no shape change at any size).
  private val bootstrapMedian: Q = (s, d) => {
    val spark = s
    // two-level global rank: the 1..n draw index without funneling the
    // point table through one unpartitioned window (see GlobalRank)
    val pts = graft.functions.GlobalRank.withGlobalIndex(
      Vario.points(s, d), "idx", col("k"))
    val n = pts.agg(count(lit(1)).as("nn"))
    val draws = spark.range(200L * 500)
      .select((col("id") / 500).cast("int").as("iter"), col("id").as("ctr"))
      .crossJoin(n)
      .select(col("iter"), (Rand.mix(col("ctr"), 3) % col("nn") + 1).as("idx"))
    draws.join(pts, "idx")
      .groupBy("iter").agg(percentile(col("v"), lit(0.5)).as("med"))
      .agg(round(avg("med"), 6).as("mean_median"),
        round(stddev_pop("med"), 6).as("median_uncertainty"))
  }
  private val bootstrapMedianSql =
    s"""WITH pts AS (SELECT v, row_number() OVER (ORDER BY k) AS idx
                     FROM (${Vario.pointsSql})),
        n AS (SELECT count(*) AS nn FROM pts),
        draws AS (SELECT CAST(ctr // 500 AS INT) AS iter,
                         (${Rand.mixSql("ctr", 3)}) % nn + 1 AS idx
                  FROM (SELECT unnest(range(${200L * 500})) AS ctr), n),
        meds AS (SELECT iter, quantile_cont(v, 0.5) AS med
                 FROM draws JOIN pts USING (idx) GROUP BY 1)
        SELECT round(avg(med), 6) AS mean_median,
               round(stddev_pop(med), 6) AS median_uncertainty
        FROM meds"""

  // §2.7 Poisson bootstrap — the 100-TB form of the reference's resample
  // loop (variography_uncertainty.py:289–316). Index-join resampling (our
  // v_bootstrap_median, faithful at small n) needs a row-number over the
  // data; at scale the standard trick is per-row Poisson(1) weights: each
  // replicate's multiset is {row × k_r}, k_r ~ Poisson(1) from the counter
  // RNG — ONE pass over the data, no index, no shuffle beyond the final
  // per-replicate aggregate. Inverse-CDF thresholds are shared decimal
  // literals, so both engines draw identical k from identical dyadic u.
  private val POISSON_REPS = 20
  private val poissonCum: Seq[Double] = {
    val e1 = math.exp(-1.0)
    // cumulative P(K <= j) for K ~ Poisson(1), j = 0..7: term_j = e⁻¹/j!
    // (j starts at 0 — an off-by-one here skews mean k from 1 to 3.3 and
    // BOTH engines would share it; the bootstrap-sanity test in MlSqlSpec
    // is what actually guards these constants, not the oracle gate)
    Seq.iterate((e1, e1, 0.0), 8) { case (cum, term, j) =>
      val jn = j + 1.0; val t = term / jn; (cum + t, t, jn)
    }.map(_._1)
  }
  private val poissonBoot: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .select((col("l_orderkey") * 8 + col("l_linenumber")).as("rk"),
        floor(col("l_quantity") * 100 + 0.5).cast("long").as("q2"))
      .withColumn("rep", explode(sequence(lit(0), lit(POISSON_REPS - 1))))
    val u = Rand.u01(col("rk") * 32 + col("rep"), 51)
    val k = poissonCum.zipWithIndex.foldRight(lit(8): Column) {
      case ((c, j), rest) => when(u < c, j).otherwise(rest) }.cast("long")
    li.withColumn("k", k)
      .groupBy("rep")
      .agg(sum("k").as("n_eff"),
        round(sum(col("k") * col("q2")).cast("double") / 100.0 /
          sum("k").cast("double"), 6).as("wmean_qty"))
  }

  private val poissonBootSql = {
    val u = Rand.u01Sql("rk * 32 + rep", 51)
    val k = poissonCum.zipWithIndex.reverse
      .foldLeft("8") { case (rest, (c, j)) =>
        s"CASE WHEN ($u) < $c THEN $j ELSE $rest END" }
    s"""WITH li AS (SELECT l_orderkey * 8 + l_linenumber AS rk,
                           CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q2,
                           CAST(rep AS INT) AS rep
                    FROM lineitem, (SELECT unnest(range($POISSON_REPS)) AS rep)),
        w AS (SELECT rep, q2, CAST($k AS BIGINT) AS k FROM li)
        SELECT rep, CAST(sum(k) AS BIGINT) AS n_eff,
               round(CAST(CAST(sum(k * q2) AS BIGINT) AS DOUBLE) / 100.0 /
                     CAST(CAST(sum(k) AS BIGINT) AS DOUBLE), 6) AS wmean_qty
        FROM w GROUP BY 1"""
  }

  // §2.9+§2.3 Monte-Carlo correlated uncertainty: zip-join of paired
  // uniform draws in a rectangle, mean covariance → σ_corr
  // (estimate_monte_carlo, variography_uncertainty.py:1238–1274).
  // Fixture size: the reference notebook draws 25 000 pairs (library
  // default 200 000); 20 000 here is the same constant-factor knob — the
  // plan is one seeded range + one aggregate at any count.
  /** Shared MC pair table (salts 41–44): X,Y uniform in the canonical
    * rectangle x∈[100,700), y∈[50,450). `u_mc_correlated` and
    * `u_mc_hetero` draw the SAME pairs, which is what makes the
    * constant-σ reduction property exact (McHeteroSpec). */
  private[graft] def mcPairs(s: SparkSession, nPairs: Int = 20000): DataFrame =
    s.range(nPairs)
      .select(
        (Rand.u01(col("id"), 41) * 600.0 + 100.0).as("x1"),
        (Rand.u01(col("id"), 42) * 400.0 + 50.0).as("y1"),
        (Rand.u01(col("id"), 43) * 600.0 + 100.0).as("x2"),
        (Rand.u01(col("id"), 44) * 400.0 + 50.0).as("y2"))

  private val mcCorrelated: Q = (s, d) => {
    val m = Spherical.canonical
    val pairs = mcPairs(s)
      .select(sqrt(pow(col("x2") - col("x1"), 2) + pow(col("y2") - col("y1"), 2)).as("h"))
    pairs.agg(avg(m.cov(col("h"))).as("mean_cov"))
      .select(round(sqrt(greatest(col("mean_cov"), lit(0.0))), 6).as("sigma_correlated"))
  }
  private val mcCorrelatedSql = {
    val m = Spherical.canonical
    val u = (salt: Int) => Rand.u01Sql("i", salt)
    s"""WITH pairs AS (
          SELECT sqrt(pow((${u(43)} * 600.0 + 100.0) - (${u(41)} * 600.0 + 100.0), 2)
                    + pow((${u(44)} * 400.0 + 50.0) - (${u(42)} * 400.0 + 50.0), 2)) AS h
          FROM (SELECT unnest(range(20000)) AS i))
        SELECT round(sqrt(greatest(avg(${m.covSql("h")}), 0.0)), 6) AS sigma_correlated
        FROM pairs"""
  }

  // §2.9 heteroscedastic Monte-Carlo uncertainty: when a spatially varying
  // per-pixel standard deviation σ(x,y) is provided, the estimator becomes
  //   Var(mean) ≈ E[ ρ(‖X−Y‖) · σ(X) · σ(Y) ],  ρ(h) = clip(1 − γ(h)/σ²_tot)
  // (estimate_monte_carlo with sigma_func, variography_uncertainty.py:
  // 1263–1274). σ(x,y) is realized the way a production pipeline would
  // hand it over: a COARSE σ GRID (the reference's `sigma2_map` nearest-
  // neighbour lookup, :1345–1355) — a 64-cell broadcast table joined once
  // per pair endpoint. At 100 TB the grid stays a broadcast dim (σ maps
  // are per-tile summaries, orders of magnitude smaller than pixels) and
  // the plan is two broadcast-hash joins + one aggregate — zero shuffles
  // on the pair table. Both engines derive the grid from the same counter
  // RNG, so the lookup is deterministic and oracle-hashable.
  /** Deterministic coarse σ grid: 8×8 cells of `cell`-sized squares,
    * σ ∈ [0.15, 0.35) from the counter RNG (scaled so σ² stays inside the
    * canonical model's total sill 0.065 neighbourhood). */
  private[graft] def sigmaGrid(s: SparkSession): DataFrame =
    s.range(64).select(
      (col("id") % 8).as("gx"),
      (col("id") / 8).cast("long").as("gy"),
      (lit(0.15) + Rand.u01(col("id"), 45) * 0.2).as("sigma"))
  private[graft] val sigmaGridSql: String =
    s"""SELECT i % 8 AS gx, i // 8 AS gy,
          0.15 + ${Rand.u01Sql("i", 45)} * 0.2 AS sigma
        FROM (SELECT unnest(range(64)) AS i)"""

  /** E[ρ·σX·σY] aggregate over a pair table carrying x1,y1,x2,y2 —
    * `cell` maps coordinates onto the σ grid. Package-private so
    * McHeteroSpec can drive it with a constant σ and assert the exact
    * reduction to the homoscedastic estimator. */
  private[graft] def mcSigmaEstimate(s: SparkSession, pairs: DataFrame,
                                     cell: Double, outName: String,
                                     grid: Option[DataFrame] = None): DataFrame = {
    val m = Spherical.canonical
    val g = grid.getOrElse(sigmaGrid(s))
    val g1 = g.select(col("gx").as("gx1"), col("gy").as("gy1"), col("sigma").as("sig1"))
    val g2 = g.select(col("gx").as("gx2"), col("gy").as("gy2"), col("sigma").as("sig2"))
    val rho = greatest(lit(-1.0), least(lit(1.0),
      m.rho(sqrt(pow(col("x2") - col("x1"), 2) + pow(col("y2") - col("y1"), 2)))))
    pairs
      .withColumn("gx1", floor(col("x1") / cell).cast("long"))
      .withColumn("gy1", floor(col("y1") / cell).cast("long"))
      .withColumn("gx2", floor(col("x2") / cell).cast("long"))
      .withColumn("gy2", floor(col("y2") / cell).cast("long"))
      .join(broadcast(g1), Seq("gx1", "gy1"))
      .join(broadcast(g2), Seq("gx2", "gy2"))
      .select((rho * col("sig1") * col("sig2")).as("t"), col("sig1"))
      // INTEGER-EXACT means (1e-6-quantized long sums, one divide): the
      // house convention for hash-gated float means — a raw avg(double)
      // is merge-order-dependent and flipped o_range_join's 6th decimal
      // between two DuckDB runs at sf1 (ADVICE r13 asked for the same
      // treatment here even though the fixed N=20000 makes a flip
      // unlikely; convention beats per-query risk arguments)
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(floor(col("sig1") * 1e6 + 0.5).cast("long")).cast("double") /
          (count(lit(1)).cast("double") * 1e6), 6).as("mean_sigma"),
        round(sqrt(greatest(
          sum(floor(col("t") * 1e6 + 0.5).cast("long")).cast("double") /
            (count(lit(1)).cast("double") * 1e6), lit(0.0))), 6).as(outName))
  }
  private def mcSigmaEstimateSql(pairsSql: String, cell: Double,
                                 outName: String): String = {
    val m = Spherical.canonical
    val rho = s"greatest(-1.0, least(1.0, ${m.rhoSql(
      "sqrt(pow(x2 - x1, 2) + pow(y2 - y1, 2))")}))"
    s"""WITH grid AS ($sigmaGridSql),
        pairs AS ($pairsSql),
        j AS (SELECT ($rho) * g1.sigma * g2.sigma AS t, g1.sigma AS sig1
              FROM pairs
              JOIN grid g1 ON g1.gx = CAST(floor(x1 / $cell) AS BIGINT)
                          AND g1.gy = CAST(floor(y1 / $cell) AS BIGINT)
              JOIN grid g2 ON g2.gx = CAST(floor(x2 / $cell) AS BIGINT)
                          AND g2.gy = CAST(floor(y2 / $cell) AS BIGINT))
        SELECT count(*) AS n_pairs,
               round(CAST(sum(CAST(floor(sig1 * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                     / (CAST(count(*) AS DOUBLE) * 1000000.0), 6) AS mean_sigma,
               round(sqrt(greatest(
                 CAST(sum(CAST(floor(t * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                 / (CAST(count(*) AS DOUBLE) * 1000000.0), 0.0)), 6) AS $outName
        FROM j"""
  }

  private val mcHetero: Q = (s, d) =>
    mcSigmaEstimate(s, mcPairs(s), cell = 100.0, outName = "sigma_hetero")
  private val mcHeteroSql = {
    val u = (salt: Int) => Rand.u01Sql("i", salt)
    val pairsSql =
      s"""SELECT ${u(41)} * 600.0 + 100.0 AS x1, ${u(42)} * 400.0 + 50.0 AS y1,
                 ${u(43)} * 600.0 + 100.0 AS x2, ${u(44)} * 400.0 + 50.0 AS y2
          FROM (SELECT unnest(range(20000)) AS i)"""
    mcSigmaEstimateSql(pairsSql, cell = 100.0, outName = "sigma_hetero")
  }

  // §2.9 raster-footprint heteroscedastic MC (estimate_monte_carlo_raster
  // with sigma_func, variography_uncertainty.py:1386–1416): identical
  // estimator, but X and Y are sampled uniformly from the raster-valid
  // FOOTPRINT polygon ('detailed' level of detail) instead of a rectangle.
  // Footprint = the diamond |x−64.3|+|y−64.3| < 30.2 (the engine's
  // canonical test polygon, rng_uniform_in_poly); rejection-sample two
  // independent candidate streams over the bbox, rank each accepted stream
  // by draw id (two-level GlobalRank — no whole-table window), and
  // zip-join rank i of X to rank i of Y. Pair count is min(acceptX,
  // acceptY) capped at N — identical in both engines because the accept
  // sets are identical. Candidate headroom 3× over the diamond's exact
  // 0.5 acceptance ratio.
  private val MC_RASTER_PAIRS = 10000
  private val mcHeteroRaster: Q = (s, d) => {
    def accepted(saltX: Int, saltY: Int, xn: String, yn: String): DataFrame = {
      val c = s.range(3L * MC_RASTER_PAIRS).select(col("id"),
        (Rand.u01(col("id"), saltX) * 60.4 + 34.1).as(xn),
        (Rand.u01(col("id"), saltY) * 60.4 + 34.1).as(yn))
        .filter(abs(col(xn) - lit(64.3)) + abs(col(yn) - lit(64.3)) < 30.2)
      graft.functions.GlobalRank.withGlobalIndex(c, "r", col("id")).drop("id")
    }
    val pairs = accepted(46, 47, "x1", "y1")
      .join(accepted(48, 49, "x2", "y2"), "r")
      .filter(col("r") <= MC_RASTER_PAIRS)
    mcSigmaEstimate(s, pairs, cell = 20.0, outName = "sigma_hetero_raster")
  }
  private val mcHeteroRasterSql = {
    def acc(saltX: Int, saltY: Int, xn: String, yn: String): String =
      s"""SELECT row_number() OVER (ORDER BY i) AS r,
            ${Rand.u01Sql("i", saltX)} * 60.4 + 34.1 AS $xn,
            ${Rand.u01Sql("i", saltY)} * 60.4 + 34.1 AS $yn
          FROM (SELECT unnest(range(${3L * MC_RASTER_PAIRS})) AS i)
          WHERE abs((${Rand.u01Sql("i", saltX)} * 60.4 + 34.1) - 64.3)
              + abs((${Rand.u01Sql("i", saltY)} * 60.4 + 34.1) - 64.3) < 30.2"""
    val pairsSql =
      s"""SELECT x1, y1, x2, y2
          FROM (${acc(46, 47, "x1", "y1")}) a JOIN (${acc(48, 49, "x2", "y2")}) b
          USING (r) WHERE r <= $MC_RASTER_PAIRS"""
    mcSigmaEstimateSql(pairsSql, cell = 20.0, outName = "sigma_hetero_raster")
  }

  // §2.9 analytical disk-integral correlated term, midpoint rule
  // (σ²_A = (2π/A)∫ r·C(r)dr; variography_uncertainty.py:1184–1195)
  private val analyticalDisk: Q = (s, d) => {
    val m = Spherical.canonical
    val radius = 300.0
    val steps = 1000
    val dr = radius / steps
    val r = (col("id").cast("double") + 0.5) * dr
    s.range(steps)
      .select((r * m.cov(r) * dr).as("term"))
      .agg(sum("term").as("integral"))
      .select(round(sqrt(greatest(
        lit(2.0 * math.Pi / (math.Pi * radius * radius)) * col("integral"),
        lit(0.0))), 6).as("sigma_analytical"))
  }
  private val analyticalDiskSql = {
    val m = Spherical.canonical
    val radius = 300.0; val steps = 1000; val dr = radius / steps
    s"""WITH terms AS (
          SELECT ((CAST(i AS DOUBLE) + 0.5) * $dr) *
                 (${m.covSql(s"((CAST(i AS DOUBLE) + 0.5) * $dr)")}) * $dr AS term
          FROM (SELECT unnest(range($steps)) AS i))
        SELECT round(sqrt(greatest(${2.0 * math.Pi / (math.Pi * radius * radius)} * sum(term), 0.0)), 6)
          AS sigma_analytical
        FROM terms"""
  }

  // §2.9 brute-force double sum σ²_A = (1/N²)ΣΣ C(d_ij) over a bounded
  // grid (the validation estimator, variography_uncertainty.py:1197–1234)
  private val bruteForce: Q = (s, d) => {
    val m = Spherical.canonical
    val (w, h) = (40, 30)
    val cells = s.range(w.toLong * h).select(
      (col("id") % w).cast("double").as("x"),
      (col("id") / w).cast("long").cast("double").as("y"))
    val a = cells.select(col("x").as("x1"), col("y").as("y1"))
    val b = cells.select(col("x").as("x2"), col("y").as("y2"))
    a.crossJoin(b)
      .select(m.cov(sqrt(
        (col("x2") - col("x1")) * (col("x2") - col("x1")) +
        (col("y2") - col("y1")) * (col("y2") - col("y1")))).as("c"))
      .agg(count(lit(1)).as("n_pairs"),
        round(sqrt(greatest(avg(col("c")), lit(0.0))), 6).as("sigma_brute"))
  }
  private val bruteForceSql = {
    val m = Spherical.canonical
    val (w, h) = (40, 30)
    s"""WITH cells AS (
          SELECT CAST(i % $w AS DOUBLE) AS x, CAST(i // $w AS DOUBLE) AS y
          FROM (SELECT unnest(range(${w * h})) AS i))
        SELECT count(*) AS n_pairs,
               round(sqrt(greatest(avg(${m.covSql(
                 "sqrt((b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y))")}), 0.0)), 6)
                 AS sigma_brute
        FROM cells a, cells b"""
  }

  // §2.3 Hugonnet K-centers cross join: mean ρ(dist) between every sample
  // point and K random centers (variography_uncertainty.py:1322–1378).
  // Fixture size: the reference uses K=100 centers; K=50 here — the
  // centers side is a broadcast constant either way, so only the
  // per-point flop count changes, never the plan shape.
  private val hugonnet: Q = (s, d) => {
    val m = Spherical.canonical
    val centers = s.range(50)
      .select(col("id").as("cid"),
        (Rand.u01(col("id"), 51) * 1000.0).as("cx"),
        (Rand.u01(col("id"), 52) * 1000.0).as("cy"))
    Vario.points(s, d).crossJoin(broadcast(centers))
      .select(col("cid"),
        m.rho(sqrt(pow(col("x") - col("cx"), 2) + pow(col("y") - col("cy"), 2))).as("rho"))
      .groupBy("cid").agg(count(lit(1)).as("n"), round(avg("rho"), 6).as("mean_rho"))
  }
  private val hugonnetSql = {
    val m = Spherical.canonical
    s"""WITH centers AS (
          SELECT i AS cid, ${Rand.u01Sql("i", 51)} * 1000.0 AS cx,
                 ${Rand.u01Sql("i", 52)} * 1000.0 AS cy
          FROM (SELECT unnest(range(50)) AS i)),
        pts AS (${Vario.pointsSql})
        SELECT cid, count(*) AS n,
               round(avg(${m.rhoSql("sqrt(pow(x - cx, 2) + pow(y - cy, 2))")}), 6) AS mean_rho
        FROM pts, centers GROUP BY 1"""
  }

  // §2.7 uniform points in polygon (rejection over bbox) — diamond accept
  // (_UniformMultiPolygonSampler, variography_uncertainty.py:1011–1047)
  private val uniformInPoly: Q = (s, d) =>
    s.range(2000)
      .select(col("id"),
        (Rand.u01(col("id"), 31) * 60.4 + 34.1).as("x"),
        (Rand.u01(col("id"), 32) * 60.4 + 34.1).as("y"))
      .filter(abs(col("x") - lit(64.3)) + abs(col("y") - lit(64.3)) < 30.2)
      .select(col("id"), round(col("x"), 6).as("x"), round(col("y"), 6).as("y"))
  private val uniformInPolySql =
    s"""SELECT i AS id,
          round(${Rand.u01Sql("i", 31)} * 60.4 + 34.1, 6) AS x,
          round(${Rand.u01Sql("i", 32)} * 60.4 + 34.1, 6) AS y
        FROM (SELECT unnest(range(2000)) AS i)
        WHERE abs((${Rand.u01Sql("i", 31)} * 60.4 + 34.1) - 64.3)
            + abs((${Rand.u01Sql("i", 32)} * 60.4 + 34.1) - 64.3) < 30.2"""

  // §2.7 Gaussian perturbation via Box–Muller on counter uniforms
  // (variography_uncertainty.py:640–642, 806–810)
  private val gaussianDraws: Q = (s, d) =>
    s.range(20000)
      .select(Rand.gaussian(col("id"), 61).as("z"))
      .agg(count(lit(1)).as("n"), round(avg("z"), 6).as("mean_z"),
        round(stddev_pop(col("z")), 6).as("std_z"),
        // 16/50/84 percentile bands (bootstrap-parameter summary shape,
        // variography_uncertainty.py:902–913)
        round(percentile(col("z"), lit(0.16)), 6).as("p16"),
        round(percentile(col("z"), lit(0.5)), 6).as("median_z"),
        round(percentile(col("z"), lit(0.84)), 6).as("p84"))
  private val gaussianDrawsSql =
    s"""SELECT count(*) AS n,
          round(avg(z), 6) AS mean_z,
          round(stddev_pop(z), 6) AS std_z,
          round(quantile_cont(z, 0.16), 6) AS p16,
          round(quantile_cont(z, 0.5), 6) AS median_z,
          round(quantile_cont(z, 0.84), 6) AS p84
        FROM (SELECT ${Rand.gaussianSql("i", 61)} AS z
              FROM (SELECT unnest(range(20000)) AS i))"""

  // §2.9 total uncertainty in quadrature: σ_tot = √(σ_corr² + σ_unc²)
  // (variography_uncertainty.py:1554–1573)
  private val quadratureTotal: Q = (s, d) => {
    val m = Spherical.canonical
    val pts = Vario.points(s, d)
    pts.agg(count(lit(1)).as("n"), sqrt(avg(col("v") * col("v"))).as("rms"))
      .select(
        round(col("rms") / sqrt(col("n")), 6).as("sigma_uncorrelated"),
        round(lit(math.sqrt(2.0 * m.totalSill) / math.sqrt(50.0)), 6).as("sigma_correlated"),
        round(sqrt(pow(col("rms") / sqrt(col("n")), 2) +
          pow(lit(math.sqrt(2.0 * m.totalSill) / math.sqrt(50.0)), 2)), 6).as("sigma_total"))
  }
  private val quadratureTotalSql = {
    val m = Spherical.canonical
    val corr = math.sqrt(2.0 * m.totalSill) / math.sqrt(50.0)
    s"""SELECT round(rms / sqrt(n), 6) AS sigma_uncorrelated,
          round($corr, 6) AS sigma_correlated,
          round(sqrt(pow(rms / sqrt(n), 2) + pow($corr, 2)), 6) AS sigma_total
        FROM (SELECT count(*) AS n, sqrt(avg(v * v)) AS rms FROM (${Vario.pointsSql}))"""
  }

  // ---- v_jackknife: delete-group jackknife SE of the mean ----------------
  // The third classical resampler beside the engine's bootstrap and CV:
  // split the stream into K=10 md5-free deterministic groups
  // (event_id % 10), recompute the mean leaving each group out, and
  // report the jackknife standard error. Convention note: deviations are
  // taken around the FULL-sample mean (not the mean of the K leave-one-out
  // estimates) — the delete-group variant both engines run identically;
  // the two centers differ by O(1/K²) and the fixture pins this one.
  // Exactness: per-group sums run over 1e-6-quantized integers (exact
  // longs any merge order); each θ_i is one fixed double tree over those
  // integers; squared deviations re-quantize to 1e-12 integers BEFORE the
  // K-row sum, so the final reduction is an exact integer aggregate too.
  // Scale shape: one corpus hash-aggregate to K rows, then K-row math.
  private val JACK_K = 10
  private val jackknife: Q = (s, d) => {
    val ev = Tables.events(s, d).select(
      (col("event_id") % JACK_K).as("run"),
      expr("CAST(floor(value * 1000000 + 0.5) AS BIGINT)").as("q"))
    val per = ev.groupBy("run")
      .agg(count(lit(1)).as("ni"), sum("q").as("si"))
    val tot = per.agg(sum("ni").as("n"), sum("si").as("sT"),
      count(lit(1)).as("k"))
    def dbl(c: Column) = c.cast("double")
    val thetaFull = dbl(col("sT")) / dbl(col("n")) / 1e6
    val thetaI = dbl(col("sT") - col("si")) / dbl(col("n") - col("ni")) / 1e6
    per.crossJoin(broadcast(tot))
      .select(col("k"), col("n"), thetaFull.as("tf"), thetaI.as("ti"))
      .select(col("k"), col("n"), col("tf"), col("ti"),
        floor((col("ti") - col("tf")) * (col("ti") - col("tf")) * 1e12 + 0.5)
          .cast("long").as("devq"))
      .groupBy("k", "n")
      .agg(round(min("tf"), 6).as("theta"),
        round(min("ti"), 6).as("theta_loo_min"),
        round(max("ti"), 6).as("theta_loo_max"),
        round(sqrt((dbl(col("k") - 1) / dbl(col("k"))) *
          (dbl(sum("devq")) / 1e12)), 9).as("se_jack"))
  }

  private val jackknifeSql =
    s"""WITH ev AS (SELECT event_id % $JACK_K AS run,
                           CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS q
                    FROM events),
        per AS (SELECT run, count(*) AS ni, CAST(sum(q) AS BIGINT) AS si
                FROM ev GROUP BY 1),
        tot AS (SELECT CAST(sum(ni) AS BIGINT) AS n,
                       CAST(sum(si) AS BIGINT) AS sT,
                       count(*) AS k FROM per),
        j AS (SELECT k, n,
                     CAST(sT AS DOUBLE) / CAST(n AS DOUBLE) / 1e6 AS tf,
                     CAST(sT - si AS DOUBLE) / CAST(n - ni AS DOUBLE) / 1e6 AS ti
              FROM per CROSS JOIN tot),
        dq AS (SELECT k, n, tf, ti,
                      CAST(floor((ti - tf) * (ti - tf) * 1e12 + 0.5) AS BIGINT)
                        AS devq
               FROM j)
        SELECT k, n, round(min(tf), 6) AS theta,
               round(min(ti), 6) AS theta_loo_min,
               round(max(ti), 6) AS theta_loo_max,
               round(sqrt((CAST(k - 1 AS DOUBLE) / CAST(k AS DOUBLE)) *
                 (CAST(sum(devq) AS DOUBLE) / 1e12)), 9) AS se_jack
        FROM dq GROUP BY 1, 2"""

  val queries: Map[String, Q] = Map(
    "v_jackknife" -> jackknife,
    "v_sample_points" -> samplePoints,
    "v_multirun_sample" -> multirunSample,
    "v_variogram" -> variogram,
    "v_cross_run" -> crossRun,
    "v_bootstrap_median" -> bootstrapMedian,
    "v_poisson_boot" -> poissonBoot,
    "u_mc_correlated" -> mcCorrelated,
    "u_mc_hetero" -> mcHetero,
    "u_mc_hetero_raster" -> mcHeteroRaster,
    "u_analytical_disk" -> analyticalDisk,
    "u_brute_force" -> bruteForce,
    "u_hugonnet" -> hugonnet,
    "u_quadrature_total" -> quadratureTotal,
    "rng_uniform_in_poly" -> uniformInPoly,
    "rng_gaussian" -> gaussianDraws,
  )

  val oracle: Map[String, String] = Map(
    "v_jackknife" -> jackknifeSql,
    "v_sample_points" -> samplePointsSql,
    "v_multirun_sample" -> multirunSampleSql,
    "v_variogram" -> variogramSql,
    "v_cross_run" -> crossRunSql,
    "v_bootstrap_median" -> bootstrapMedianSql,
    "v_poisson_boot" -> poissonBootSql,
    "u_mc_correlated" -> mcCorrelatedSql,
    "u_mc_hetero" -> mcHeteroSql,
    "u_mc_hetero_raster" -> mcHeteroRasterSql,
    "u_analytical_disk" -> analyticalDiskSql,
    "u_brute_force" -> bruteForceSql,
    "u_hugonnet" -> hugonnetSql,
    "u_quadrature_total" -> quadratureTotalSql,
    "rng_uniform_in_poly" -> uniformInPolySql,
    "rng_gaussian" -> gaussianDrawsSql,
  )
}
