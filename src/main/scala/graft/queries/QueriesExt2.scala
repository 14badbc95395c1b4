package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Canon.round
import graft.Tables

/** Relational-surface widening (round 2): fuzzy entity matching, CUBE,
  * unpivot/melt, rank-family window functions, EWMA smoothing, fixed-bin
  * histograms, and bivariate statistics — each with lockstep DuckDB oracle
  * SQL.
  *
  * Scale notes (100-TB posture):
  * - fuzzy matching dedups to DISTINCT values BEFORE the pairwise stage
  *   (edit distance runs on |vocabulary|², not |rows|²) and blocks on a
  *   cheap key so no unblocked pair space is ever materialized;
  * - CUBE/unpivot sums are cents-scaled to integers (partial sums ≪ 2^53)
  *   so Spark's partial-agg merge order and DuckDB's sequential fold agree
  *   bit-for-bit;
  * - EWMA uses a FIXED-ORDER 10-term weighted chain with power-of-two
  *   weights — identical association in both engines ⇒ bit-identical
  *   doubles;
  * - window ranks order by raw columns with id tie-breaks (invariant #4).
  */
object QueriesExt2 {
  type Q = (SparkSession, String) => DataFrame

  // ---- fuzzy name matching (blocked levenshtein) ------------------------
  // Entity-resolution shape: DISTINCT names → block on the head noun →
  // pairwise edit distance inside blocks only → attach per-name row
  // support. The distinct-first step is the scale lever: the pair space is
  // |vocab|² (constant-ish), never |rows|².
  private val FUZZMAX = 2
  private val fuzzyNames: Q = (s, d) => {
    val counts = Tables.part(s, d).groupBy("p_name")
      .agg(count(lit(1)).as("n"))
      .withColumn("blk", split(col("p_name"), " ").getItem(1))
    val a = counts.select(col("p_name").as("a_name"), col("n").as("n_a"),
      col("blk"))
    val b = counts.select(col("p_name").as("b_name"), col("n").as("n_b"),
      col("blk"))
    a.join(b, Seq("blk"))
      .filter(col("a_name") < col("b_name"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")).cast("long"))
      .filter(col("dist") <= FUZZMAX)
      .select("a_name", "b_name", "dist", "n_a", "n_b")
  }

  private val fuzzyNamesSql =
    s"""WITH counts AS (SELECT p_name, count(*) AS n,
                               split_part(p_name, ' ', 2) AS blk
                        FROM part GROUP BY 1)
        SELECT a.p_name AS a_name, b.p_name AS b_name,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
               a.n AS n_a, b.n AS n_b
        FROM counts a JOIN counts b ON a.blk = b.blk AND a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= $FUZZMAX"""

  // ---- CUBE (all grouping-set combinations) -----------------------------
  // Extends a_stats11's ROLLUP to the full lattice. Sums are cents-exact.
  private def cents(c: Column) = round(c * 100, 0).cast("long")
  private val cubeStatus: Q = (s, d) =>
    Tables.orders(s, d).withColumn("c", cents(col("o_totalprice")))
      .cube("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n"), (sum("c") / 100.0).as("total"))
  private val cubeStatusSql =
    """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
              (CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                / 100.0) AS total
       FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)"""

  // ---- unpivot / melt ---------------------------------------------------
  // Wide measures → long (metric, value) rows, then per-metric stats.
  // stack() is Spark's generator form of UNPIVOT (no shuffle: the explode
  // happens map-side; only the 4-row aggregate shuffles).
  private val unpivot: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(expr(
        """stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice,
                    'discount', l_discount, 'tax', l_tax) AS (metric, value)"""))
      .withColumn("c", cents(col("value")))
      .groupBy("metric")
      .agg(count(lit(1)).as("n"), (sum("c") / 100.0).as("total"),
        round(min("value"), 6).as("min_value"),
        round(max("value"), 6).as("max_value"))
  private val unpivotSql =
    """SELECT metric, count(*) AS n,
              (CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                / 100.0) AS total,
              round(min(value), 6) AS min_value,
              round(max(value), 6) AS max_value
       FROM (SELECT 'quantity' AS metric, l_quantity AS value FROM lineitem
             UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
             UNION ALL SELECT 'discount', l_discount FROM lineitem
             UNION ALL SELECT 'tax', l_tax FROM lineitem)
       GROUP BY 1"""

  // ---- pivot (long → wide) ------------------------------------------------
  // The inverse of the unpivot above: per-returnflag rows pivoted on
  // l_linestatus with an EXPLICIT value list (an inferred list would add
  // a distinct-scan job and make the output schema data-dependent — the
  // wrong default at 100 TB). One hash aggregate; the pivot widens
  // columns map-side, no extra shuffle vs the plain groupBy.
  private val pivotWide: Q = (s, d) =>
    Tables.lineitem(s, d).withColumn("c", cents(col("l_extendedprice")))
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum("c"))
      .select(col("l_returnflag"),
        (coalesce(col("F"), lit(0L)) / 100.0).as("total_f"),
        (coalesce(col("O"), lit(0L)) / 100.0).as("total_o"))
  private val pivotWideSql =
    """SELECT l_returnflag,
              (CAST(coalesce(sum(CASE WHEN l_linestatus = 'F'
                 THEN CAST(round(l_extendedprice * 100, 0) AS BIGINT) END), 0)
                 AS BIGINT) / 100.0) AS total_f,
              (CAST(coalesce(sum(CASE WHEN l_linestatus = 'O'
                 THEN CAST(round(l_extendedprice * 100, 0) AS BIGINT) END), 0)
                 AS BIGINT) / 100.0) AS total_o
       FROM lineitem GROUP BY 1"""

  // ---- rank family ------------------------------------------------------
  // dense_rank / percent_rank / ntile / cume_dist in one windowed pass;
  // sampled down AFTER ranking (rank must see the full partition). The
  // exact-rational rank outputs are rounded like every float surface.
  private val rankFuncs: Q = (s, d) => {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("drank", dense_rank().over(w).cast("long"))
      .withColumn("prank", round(percent_rank().over(w), 6))
      .withColumn("tile4", ntile(4).over(w).cast("long"))
      .withColumn("cdist", round(cume_dist().over(w), 6))
      .filter(col("o_orderkey") % 199 === 0)
      .select("o_orderpriority", "o_orderkey", "o_totalprice",
        "drank", "prank", "tile4", "cdist")
  }
  private val rankFuncsSql =
    """SELECT o_orderpriority, o_orderkey, o_totalprice, drank, prank, tile4, cdist
       FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                    CAST(dense_rank() OVER w AS BIGINT) AS drank,
                    round(percent_rank() OVER w, 6) AS prank,
                    CAST(ntile(4) OVER w AS BIGINT) AS tile4,
                    round(cume_dist() OVER w, 6) AS cdist
             FROM orders
             WINDOW w AS (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice DESC, o_orderkey ASC))
       WHERE o_orderkey % 199 = 0"""

  // ---- EWMA (bounded exponential smoothing) -----------------------------
  // y_t = α·Σ_{j<10} (1−α)^j · x_{t−j} with α = 1/2: a 10-term FIXED-ORDER
  // chain of power-of-two weights. Each product is an exact scaling; both
  // engines associate the sum left-to-right ⇒ bit-identical doubles before
  // the canonical round. One shuffle on user_id; the frame is bounded, so
  // state per row is O(10) regardless of history length (the batch twin of
  // a streaming EWMA with bounded state).
  private val EWN = 10
  private val ewma: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val terms = (0 until EWN).map(j =>
      coalesce(lag(col("value"), j).over(w), lit(0.0)) *
        lit(0.5 * math.pow(0.5, j)))
    Tables.events(s, d)
      .withColumn("ewma", round(terms.reduce(_ + _), 6))
      .filter(col("event_id") % 499 === 0)
      .select("user_id", "event_id", "ts", "ewma")
  }
  private val ewmaSql = {
    val terms = (0 until EWN).map(j =>
      s"coalesce(lag(value, $j) OVER w, 0.0) * ${0.5 * math.pow(0.5, j)}")
      .mkString(" + ")
    s"""SELECT user_id, event_id, ts, ewma
        FROM (SELECT user_id, event_id, ts, round($terms, 6) AS ewma
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        WHERE event_id % 499 = 0"""
  }

  // ---- fixed-bin histogram ----------------------------------------------
  // floor(value / width) bucketing — the one-pass distributed histogram
  // (no data-dependent bin edges, so no extra pass and no driver round
  // trip). Totals are cents-exact.
  private val HBIN = 25.0
  private val histogram: Q = (s, d) =>
    Tables.events(s, d)
      .withColumn("bucket", floor(col("value") / HBIN).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("value"))) / 100.0).as("total"),
        round(min("value"), 6).as("min_value"),
        round(max("value"), 6).as("max_value"))
  private val histogramSql =
    s"""SELECT CAST(floor(value / $HBIN) AS BIGINT) AS bucket, count(*) AS n,
               (CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                 / 100.0) AS total,
               round(min(value), 6) AS min_value,
               round(max(value), 6) AS max_value
        FROM events GROUP BY 1"""

  // ---- bivariate statistics ---------------------------------------------
  // corr / covar_samp / stddev_samp per group: the co-moment aggregates
  // merge associatively (Spark partial-agg safe); outputs pass through the
  // canonical round like every float surface.
  private val corrStats: Q = (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("covar_qd"),
        round(stddev_samp(col("l_quantity")), 6).as("sd_q"))
  private val corrStatsSql =
    """SELECT l_returnflag, count(*) AS n,
              round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
              round(covar_samp(l_quantity, l_discount), 6) AS covar_qd,
              round(stddev_samp(l_quantity), 6) AS sd_q
       FROM lineitem GROUP BY 1"""

  // ---- rolling median over a bounded ROWS frame -------------------------
  // The despiking filter a time-series cleaner runs (median-of-11 around
  // each sample). Spark has no exact windowed percentile; the bounded
  // frame makes collect_list + array_sort + interpolation EXACT and
  // cheap (≤11 values per row, map-side). Values are cents-quantized
  // first, so both engines' median interpolations are exact half-integer
  // arithmetic (DuckDB's lower+(upper−lower)·0.5 and our (a+b)/2 are
  // bit-equal on integers < 2^53) — no float-order tolerance needed.
  // Frame edges shrink naturally (n_frame column shows it) in both
  // engines.
  private val rollingMedian: Q = (s, d) => {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-5, 5)
    Tables.events(s, d)
      .filter(col("user_id") < 20)
      .withColumn("c2", floor(col("value") * 100 + 0.5).cast("long"))
      .withColumn("arr", array_sort(collect_list(col("c2")).over(w)))
      .withColumn("n", size(col("arr")))
      .select(col("user_id"), col("event_id"), col("n").as("n_frame"),
        (((element_at(col("arr"), floor((col("n") + 1) / 2).cast("int")) +
          element_at(col("arr"), (floor(col("n") / 2) + 1).cast("int")))
          .cast("double") / 2.0) / 100.0).as("roll_med"))
  }
  private val rollingMedianSql =
    """SELECT user_id, event_id,
              CAST(count(*) OVER w AS INT) AS n_frame,
              quantile_cont(CAST(floor(value * 100 + 0.5) AS BIGINT), 0.5)
                OVER w / 100.0 AS roll_med
       FROM events WHERE user_id < 20
       WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                    ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)"""

  // ---- Hampel filter: rolling median ± 3·MAD outlier flag ---------------
  // The robust despiking decision built on w_rolling_median's frame: a
  // sample is an outlier when |x − median| > 3·MAD over the ±5-row
  // neighborhood. EVERYTHING stays integer-exact: cents c are scaled so
  // the median (×2), the absolute deviations (×4) and the MAD (×8) are
  // all integers, and the outlier test compares 2·dev4 > 3·mad4x2 — a
  // pure integer inequality that is bit-equivalent to DuckDB's
  // abs(c−median) > 3·mad on its exact dyadic doubles. No float-order
  // tolerance anywhere.
  private val hampel: Q = (s, d) => {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-5, 5)
    def medX2(a: Column, n: Column): Column =
      element_at(a, floor((n + 1) / 2).cast("int")) +
        element_at(a, (floor(n / 2) + 1).cast("int"))
    Tables.events(s, d)
      .filter(col("user_id") < 20)
      .withColumn("c2", floor(col("value") * 100 + 0.5).cast("long"))
      .withColumn("arr", array_sort(collect_list(col("c2")).over(w)))
      .withColumn("n", size(col("arr")))
      .withColumn("m2", medX2(col("arr"), col("n")))
      .withColumn("dev4",
        array_sort(transform(col("arr"), c => abs(c * 4 - col("m2") * 2))))
      .withColumn("mad4x2", medX2(col("dev4"), col("n")))
      .select(col("user_id"), col("event_id"), col("n").as("n_frame"),
        (col("m2").cast("double") / 200.0).as("med"),
        (col("mad4x2").cast("double") / 800.0).as("mad"),
        (abs(col("c2") * 4 - col("m2") * 2) * 2 > col("mad4x2") * 3)
          .as("is_outlier"))
  }
  private val hampelSql =
    """SELECT user_id, event_id,
              CAST(count(*) OVER w AS INT) AS n_frame,
              quantile_cont(c2, 0.5) OVER w / 100.0 AS med,
              mad(c2) OVER w / 100.0 AS mad,
              abs(CAST(c2 AS DOUBLE) - quantile_cont(c2, 0.5) OVER w)
                > 3 * mad(c2) OVER w AS is_outlier
       FROM (SELECT user_id, event_id, ts,
                    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c2
             FROM events WHERE user_id < 20)
       WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                    ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)"""

  // ---- weighted sampling without replacement (Efraimidis–Spirakis) ------
  // k rows per group, inclusion probability ∝ weight: rank by
  // ln(u)/w (monotone in u^{1/w}) with u from the counter RNG keyed on the
  // row id — a pure function of data, so the SAME rows are drawn on any
  // partitioning, any engine, any cluster size. The distributed form of
  // weighted reservoir sampling: one bounded window per group, no
  // driver-side state. Keys are canonically rounded before ranking with id
  // tie-breaks (invariant #4) so last-ulp ln/pow differences can't flip
  // the sample.
  private val WSK = 10
  private val weightedSample: Q = (s, d) => {
    // open-interval uniform (mix+1)/(M+1) — u01 proper can return exactly
    // 0 and ln(0) diverges; weights must be strictly positive (sampling
    // probability ∝ w is undefined at w ≤ 0, and ANSI division traps it)
    val ek = (graft.rng.Rand.mix(col("event_id"), 31337L).cast("double") +
      lit(1.0)) / lit(graft.rng.Rand.M.toDouble + 1.0)
    Tables.events(s, d)
      .filter(col("value") > 0.0)
      .withColumn("skey", round(log(ek) / col("value"), 9))
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(col("skey").desc, col("event_id").asc))
        .cast("long"))
      .filter(col("rk") <= WSK)
      .select(col("event_type"), col("rk"), col("event_id"),
        round(col("value"), 6).as("weight"))
  }
  private val weightedSampleSql = {
    val u = s"(((${graft.rng.Rand.mixSql("event_id", 31337L)}) + 1.0) / " +
      s"${graft.rng.Rand.M.toDouble + 1.0})"
    s"""SELECT event_type, rk, event_id, round(value, 6) AS weight
        FROM (SELECT event_type, event_id, value,
                     row_number() OVER (PARTITION BY event_type
                       ORDER BY round(ln($u) / value, 9) DESC,
                                event_id ASC) AS rk
              FROM events WHERE value > 0.0)
        WHERE rk <= $WSK"""
  }

  // ---- first / last / nth value frames ----------------------------------
  // Per-user session bookends: first/last/nth event values over the full
  // partition frame. last_value needs the explicit unbounded frame (the
  // default frame stops at CURRENT ROW — a classic silent-wrong-answer).
  private val firstLast: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, d)
      .withColumn("first_v", round(first("value").over(w), 6))
      .withColumn("last_v", round(last("value").over(w), 6))
      .withColumn("third_v", round(nth_value(col("value"), 3).over(w), 6))
      .groupBy("user_id", "first_v", "last_v", "third_v")
      .agg(count(lit(1)).as("n_events"))
  }
  private val firstLastSql =
    """SELECT user_id, first_v, last_v, third_v, count(*) AS n_events
       FROM (SELECT user_id,
                    round(first_value(value) OVER w, 6) AS first_v,
                    round(last_value(value) OVER w, 6) AS last_v,
                    round(nth_value(value, 3) OVER w, 6) AS third_v
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND UNBOUNDED FOLLOWING))
       GROUP BY 1, 2, 3, 4"""

  val queries: Map[String, Q] = Map(
    "v_weighted_sample" -> weightedSample,
    "w_first_last" -> firstLast,
    "x_fuzzy_names" -> fuzzyNames,
    "a_cube_status" -> cubeStatus,
    "a_pivot_wide" -> pivotWide,
    "a_unpivot" -> unpivot,
    "w_rank_funcs" -> rankFuncs,
    "w_ewma" -> ewma,
    "w_rolling_median" -> rollingMedian,
    "w_hampel" -> hampel,
    "a_histogram" -> histogram,
    "a_corr_stats" -> corrStats,
  )

  val oracle: Map[String, String] = Map(
    "v_weighted_sample" -> weightedSampleSql,
    "w_first_last" -> firstLastSql,
    "x_fuzzy_names" -> fuzzyNamesSql,
    "a_cube_status" -> cubeStatusSql,
    "a_pivot_wide" -> pivotWideSql,
    "a_unpivot" -> unpivotSql,
    "w_rank_funcs" -> rankFuncsSql,
    "w_ewma" -> ewmaSql,
    "w_rolling_median" -> rollingMedianSql,
    "w_hampel" -> hampelSql,
    "a_histogram" -> histogramSql,
    "a_corr_stats" -> corrStatsSql,
  )
}
