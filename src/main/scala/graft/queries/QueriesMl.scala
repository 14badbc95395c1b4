package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Canon.round
import graft.Tables
import graft.rng.Rand

/** Model-evaluation metrics over sliced predictions — the "error analysis on
  * ML models" surface of the north star (error slicing via DataFrame
  * group-bys + the standard evaluation metrics), and the engine twin of the
  * reference's cross-validation scoring (RMSE/MAE/ME/MSE of CV folds,
  * variography_uncertainty.py:714–719).
  *
  * The "model" is synthetic but fully deterministic: a latent probability
  * p = u01(id) drives a Bernoulli label (u01'(id) < p) and a noisy score
  * clamp01(p + 0.6·(u01''(id) − ½)) — a pure function of `event_id` via the
  * counter RNG, so Spark and the DuckDB oracle score identical rows
  * identically on any partitioning.
  *
  * Scale notes (100-TB posture):
  * - every metric is one hash-aggregate over the scored stream (confusion
  *   counts, calibration bins, regression moments) — partial+final agg,
  *   no driver round trips, no per-row state;
  * - AUC uses the Mann-Whitney rank-sum over (slice, score) GROUPS with
  *   exact average-rank tie handling: ranks come from a window over the
  *   ~10⁴ distinct 4-decimal scores per slice, never over raw rows, so the
  *   window input is bounded regardless of table size;
  * - rank sums are half-integers and count products stay < 2^52 ⇒ every
  *   aggregate is associativity-exact (bit-identical under any merge order);
  * - lift deciles window-partition by slice (no single-partition sort) and
  *   error sums are 1e-3-quantized to integers before aggregation.
  */
object QueriesMl {
  type Q = (SparkSession, String) => DataFrame

  // ---- shared deterministic scorer ---------------------------------------
  private def scored(s: SparkSession, d: String): DataFrame = {
    val id = col("event_id")
    val p = Rand.u01(id, 9101)
    val lab = when(Rand.u01(id, 9202) < p, 1).otherwise(0)
    val raw = p + (Rand.u01(id, 9303) - lit(0.5)) * lit(0.6)
    Tables.events(s, d).select(
      col("event_id"), col("event_type"), col("value"),
      lab.cast("int").as("label"),
      round(greatest(lit(0.0), least(lit(1.0), raw)), 4).as("score"))
  }

  private val scoredSql: String = {
    val p = Rand.u01Sql("event_id", 9101)
    val u2 = Rand.u01Sql("event_id", 9202)
    val u3 = Rand.u01Sql("event_id", 9303)
    s"""scored AS (
          SELECT event_id, event_type, value,
                 CASE WHEN ($u2) < ($p) THEN 1 ELSE 0 END AS label,
                 round(greatest(0.0, least(1.0, ($p) + (($u3) - 0.5) * 0.6)), 4)
                   AS score
          FROM events)"""
  }

  // ---- confusion matrix with slice rollup --------------------------------
  // Per-slice + overall confusion counts in ONE aggregate (ROLLUP = the
  // grouping-sets lattice ((slice),()) — no second pass for the ALL row).
  private val confusion: Q = (s, d) =>
    scored(s, d).withColumn("pred", (col("score") >= 0.5).cast("int"))
      .rollup("event_type")
      .agg(
        sum(when(col("label") === 1 && col("pred") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("label") === 0 && col("pred") === 1, 1L).otherwise(0L)).as("fp"),
        sum(when(col("label") === 1 && col("pred") === 0, 1L).otherwise(0L)).as("fn"),
        sum(when(col("label") === 0 && col("pred") === 0, 1L).otherwise(0L)).as("tn"))
      .select(coalesce(col("event_type"), lit("ALL")).as("slice"),
        col("tp"), col("fp"), col("fn"), col("tn"))

  private val confusionSql =
    s"""WITH $scoredSql,
        p AS (SELECT event_type, label,
                     CASE WHEN score >= 0.5 THEN 1 ELSE 0 END AS pred
              FROM scored)
        SELECT coalesce(event_type, 'ALL') AS slice,
               CAST(sum(CASE WHEN label = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(sum(CASE WHEN label = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(sum(CASE WHEN label = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
               CAST(sum(CASE WHEN label = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
        FROM p GROUP BY ROLLUP (event_type)"""

  // ---- population stability index per slice -------------------------------
  // The standard score-drift monitor: PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i)
  // between a reference split (even event_id) and a current split (odd),
  // 10 fixed score bins, +1 Laplace smoothing so empty bins stay finite
  // (documented fixture convention, identical in both engines). Counts
  // are exact integers; each bin's term is one fixed double tree over
  // them, re-quantized to 1e-9 integers BEFORE the 10-row sum so the
  // final reduction is merge-order-exact. PSI < 0.1 = stable, > 0.25 =
  // drifted — reported per slice beside the bin count.
  private val psi: Q = (s, d) => {
    val binned = scored(s, d).select(col("event_type"),
      least(floor(col("score") * 10).cast("int"), lit(9)).as("bin"),
      (col("event_id") % 2 === 0).as("ref"))
    val counts = binned.groupBy("event_type", "bin")
      .agg(sum(when(col("ref"), 1L).otherwise(0L)).as("cr"),
        sum(when(!col("ref"), 1L).otherwise(0L)).as("cc"))
    val tot = counts.groupBy(col("event_type").as("t_type"))
      .agg(sum("cr").as("nr"), sum("cc").as("nc"))
    def dbl(c: Column) = c.cast("double")
    val p = dbl(col("cr") + 1) / dbl(col("nr") + 10)
    val q = dbl(col("cc") + 1) / dbl(col("nc") + 10)
    counts.join(tot, col("event_type") === col("t_type"))
      .select(col("event_type"),
        floor((p - q) * log(p / q) * 1e9 + 0.5).cast("long").as("termq"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_bins"),
        round(sum("termq").cast("double") / 1e9, 6).as("psi"))
  }

  private val psiSql =
    s"""WITH $scoredSql,
        b AS (SELECT event_type,
                     least(CAST(floor(score * 10) AS INT), 9) AS bin,
                     event_id % 2 = 0 AS ref
              FROM scored),
        c AS (SELECT event_type, bin,
                     CAST(sum(CASE WHEN ref THEN 1 ELSE 0 END) AS BIGINT) AS cr,
                     CAST(sum(CASE WHEN ref THEN 0 ELSE 1 END) AS BIGINT) AS cc
              FROM b GROUP BY 1, 2),
        t AS (SELECT event_type AS t_type, CAST(sum(cr) AS BIGINT) AS nr,
                     CAST(sum(cc) AS BIGINT) AS nc
              FROM c GROUP BY 1),
        terms AS (SELECT event_type,
                         CAST(floor((CAST(cr + 1 AS DOUBLE) / CAST(nr + 10 AS DOUBLE)
                                     - CAST(cc + 1 AS DOUBLE) / CAST(nc + 10 AS DOUBLE))
                                    * ln((CAST(cr + 1 AS DOUBLE) / CAST(nr + 10 AS DOUBLE))
                                         / (CAST(cc + 1 AS DOUBLE) / CAST(nc + 10 AS DOUBLE)))
                                    * 1e9 + 0.5) AS BIGINT) AS termq
                  FROM c JOIN t ON t_type = event_type)
        SELECT event_type, count(*) AS n_bins,
               round(CAST(sum(termq) AS DOUBLE) / 1e9, 6) AS psi
        FROM terms GROUP BY 1"""

  // ---- Cohen's kappa per slice -------------------------------------------
  // Chance-corrected agreement between prediction and label (Cohen 1960):
  // kappa = (po − pe)/(1 − pe) with po the observed accuracy and pe the
  // marginal-product chance agreement. Counts are exact integer sums; the
  // kappa is ONE fixed double expression over those integers (counts cast
  // to double first), so both engines run identical IEEE ops. Same
  // one-hash-aggregate scale shape as m_confusion.
  private val kappa: Q = (s, d) => {
    val t = scored(s, d).withColumn("pred", (col("score") >= 0.5).cast("int"))
      .groupBy("event_type")
      .agg(
        sum(when(col("label") === 1 && col("pred") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("label") === 0 && col("pred") === 1, 1L).otherwise(0L)).as("fp"),
        sum(when(col("label") === 1 && col("pred") === 0, 1L).otherwise(0L)).as("fn"),
        sum(when(col("label") === 0 && col("pred") === 0, 1L).otherwise(0L)).as("tn"))
    def dbl(c: Column) = c.cast("double")
    val n = dbl(col("tp") + col("fp") + col("fn") + col("tn"))
    val po = dbl(col("tp") + col("tn")) / n
    val pe = (dbl(col("tp") + col("fp")) * dbl(col("tp") + col("fn")) +
      dbl(col("fn") + col("tn")) * dbl(col("fp") + col("tn"))) / (n * n)
    t.select(col("event_type").as("slice"),
      (col("tp") + col("fp") + col("fn") + col("tn")).as("n"),
      round(po, 6).as("po"), round(pe, 6).as("pe"),
      round((po - pe) / (lit(1.0) - pe), 6).as("kappa"))
  }

  private val kappaSql =
    s"""WITH $scoredSql,
        c AS (SELECT event_type,
                     CAST(sum(CASE WHEN label = 1 AND score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                     CAST(sum(CASE WHEN label = 0 AND score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                     CAST(sum(CASE WHEN label = 1 AND score < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
                     CAST(sum(CASE WHEN label = 0 AND score < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS tn
              FROM scored GROUP BY 1)
        SELECT event_type AS slice, tp + fp + fn + tn AS n,
               round(CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE), 6) AS po,
               round((CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
                      + CAST(fn + tn AS DOUBLE) * CAST(fp + tn AS DOUBLE))
                     / (CAST(tp + fp + fn + tn AS DOUBLE) * CAST(tp + fp + fn + tn AS DOUBLE)), 6) AS pe,
               round((CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE)
                      - (CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
                         + CAST(fn + tn AS DOUBLE) * CAST(fp + tn AS DOUBLE))
                        / (CAST(tp + fp + fn + tn AS DOUBLE) * CAST(tp + fp + fn + tn AS DOUBLE)))
                     / (1.0 - (CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
                               + CAST(fn + tn AS DOUBLE) * CAST(fp + tn AS DOUBLE))
                              / (CAST(tp + fp + fn + tn AS DOUBLE) * CAST(tp + fp + fn + tn AS DOUBLE))), 6)
                 AS kappa
        FROM c"""

  // ---- precision / recall / F1 / accuracy per slice ----------------------
  // Counts are exact integers, the ratios exact-rational divisions — both
  // engines produce bit-identical doubles before the canonical round.
  private val prf1: Q = (s, d) => {
    val t = scored(s, d).withColumn("pred", (col("score") >= 0.5).cast("int"))
      .groupBy("event_type")
      .agg(
        sum(when(col("label") === 1 && col("pred") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("label") === 0 && col("pred") === 1, 1L).otherwise(0L)).as("fp"),
        sum(when(col("label") === 1 && col("pred") === 0, 1L).otherwise(0L)).as("fn"),
        sum(when(col("label") === 0 && col("pred") === 0, 1L).otherwise(0L)).as("tn"))
    val prec = col("tp").cast("double") / (col("tp") + col("fp")).cast("double")
    val rec = col("tp").cast("double") / (col("tp") + col("fn")).cast("double")
    t.select(col("event_type"),
      (col("tp") + col("fp") + col("fn") + col("tn")).as("n"),
      round((col("tp") + col("tn")).cast("double") /
        (col("tp") + col("fp") + col("fn") + col("tn")).cast("double"), 6).as("accuracy"),
      round(prec, 6).as("precision_"),
      round(rec, 6).as("recall_"),
      round(lit(2.0) * prec * rec / (prec + rec), 6).as("f1"))
  }

  private val prf1Sql =
    s"""WITH $scoredSql,
        p AS (SELECT event_type, label,
                     CASE WHEN score >= 0.5 THEN 1 ELSE 0 END AS pred
              FROM scored),
        c AS (SELECT event_type,
                     CAST(sum(CASE WHEN label = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                     CAST(sum(CASE WHEN label = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                     CAST(sum(CASE WHEN label = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
                     CAST(sum(CASE WHEN label = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
              FROM p GROUP BY 1)
        SELECT event_type, tp + fp + fn + tn AS n,
               round(CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE), 6) AS accuracy,
               round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) AS precision_,
               round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6) AS recall_,
               round(2.0 * (CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))
                         * (CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))
                     / ((CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))
                        + (CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))), 6) AS f1
        FROM c"""

  // ---- exact AUC (Mann-Whitney rank-sum, average-rank ties) --------------
  // AUC = (Σ_{positives} avgrank − P(P+1)/2) / (P·N). Ranks are computed
  // over (slice, score) GROUPS: cum(n) − (n−1)/2 is the average rank of a
  // tie group, so ties contribute exactly ½ — the textbook estimator, not
  // the tie-breaking approximation. All terms are half-integers < 2^52 ⇒
  // exact under any aggregation order.
  private val auc: Q = (s, d) => {
    val g = scored(s, d).groupBy("event_type", "score")
      .agg(count(lit(1)).as("n"), sum("label").cast("long").as("pos"))
    val w = Window.partitionBy("event_type").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r = g.withColumn("ar",
      sum(col("n")).over(w).cast("double") -
        (col("n").cast("double") - lit(1.0)) / lit(2.0))
    r.groupBy("event_type")
      .agg(sum(col("pos")).as("pos"), (sum(col("n")) - sum(col("pos"))).as("neg"),
        sum(col("pos").cast("double") * col("ar")).as("srp"))
      .select(col("event_type"), col("pos"), col("neg"),
        round((col("srp") - (col("pos") * (col("pos") + 1) / 2).cast("double")) /
          (col("pos") * col("neg")).cast("double"), 6).as("auc"))
  }

  private val aucSql =
    s"""WITH $scoredSql,
        g AS (SELECT event_type, score, count(*) AS n,
                     CAST(sum(label) AS BIGINT) AS pos
              FROM scored GROUP BY 1, 2),
        r AS (SELECT event_type, n, pos,
                     CAST(sum(n) OVER (PARTITION BY event_type ORDER BY score
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS DOUBLE)
                       - (CAST(n AS DOUBLE) - 1.0) / 2.0 AS ar
              FROM g),
        a AS (SELECT event_type, CAST(sum(pos) AS BIGINT) AS pos,
                     CAST(sum(n) - sum(pos) AS BIGINT) AS neg,
                     sum(CAST(pos AS DOUBLE) * ar) AS srp
              FROM r GROUP BY 1)
        SELECT event_type, pos, neg,
               round((srp - CAST(pos * (pos + 1) // 2 AS DOUBLE))
                     / CAST(pos * neg AS DOUBLE), 6) AS auc
        FROM a"""

  // ---- calibration / reliability bins ------------------------------------
  // Fixed decile bins on the score (data-independent edges ⇒ one pass).
  // Mean score is 1e-4-quantized to integers before summing (exact under
  // partial-agg merge), positive rate is an exact integer ratio.
  private val calibration: Q = (s, d) => {
    val t = scored(s, d).withColumn("bin",
      least(lit(9L), floor(col("score") * 10).cast("long")))
    val s4 = sum(round(col("score") * 10000, 0).cast("long")).cast("double")
    val ms = s4 / lit(10000.0) / count(lit(1)).cast("double")
    val pr = sum("label").cast("double") / count(lit(1)).cast("double")
    t.groupBy("bin").agg(count(lit(1)).as("n"),
      round(ms, 6).as("mean_score"), round(pr, 6).as("pos_rate"),
      round(abs(ms - pr), 6).as("cal_gap"))
  }

  private val calibrationSql =
    s"""WITH $scoredSql
        SELECT least(9, CAST(floor(score * 10) AS BIGINT)) AS bin,
               count(*) AS n,
               round(CAST(CAST(sum(CAST(round(score * 10000, 0) AS BIGINT)) AS BIGINT) AS DOUBLE)
                     / 10000.0 / CAST(count(*) AS DOUBLE), 6) AS mean_score,
               round(CAST(sum(label) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS pos_rate,
               round(abs(CAST(CAST(sum(CAST(round(score * 10000, 0) AS BIGINT)) AS BIGINT) AS DOUBLE)
                         / 10000.0 / CAST(count(*) AS DOUBLE)
                         - CAST(sum(label) AS DOUBLE) / CAST(count(*) AS DOUBLE)), 6) AS cal_gap
        FROM scored GROUP BY 1"""

  // ---- expected calibration error (scalar per slice) ---------------------
  // ECE/MCE summarize m_calibration's reliability diagram into the two
  // numbers a model card reports. Key identity: with per-bin integer sums
  // (s4 = Σ 1e4·score, pos = Σ label), the weighted gap collapses to
  //   ECE = Σ_b (n_b/N)·|pos_b/n_b − s4_b/(1e4·n_b)|
  //       = Σ_b |1e4·pos_b − s4_b| / (1e4·N)
  // — one exact-integer numerator per slice, so no float sum ever crosses
  // a bin boundary and partial-agg merge order cannot matter. MCE takes
  // the max over per-bin rational gaps (one division per bin, then an
  // order-exact max). GROUPING SETS ((slice,bin),(bin)) produces per-slice
  // AND overall bins in the same single pass.
  private val ece: Q = (s, d) => {
    val t = scored(s, d).withColumn("bin",
      least(lit(9L), floor(col("score") * 10).cast("long")))
    val binAgg = t.groupingSets(
        Seq(Seq(col("event_type"), col("bin")), Seq(col("bin"))),
        col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("score") * 10000, 0).cast("long")).as("s4"),
        sum("label").cast("long").as("pos"))
    val gapInt = abs(col("pos") * 10000L - col("s4"))
    binAgg
      .groupBy(coalesce(col("event_type"), lit("ALL")).as("event_type"))
      .agg(sum("n").as("n"),
        round(sum(gapInt).cast("double") /
          (lit(1e4) * sum("n").cast("double")), 6).as("ece"),
        round(max(gapInt.cast("double") /
          (lit(1e4) * col("n").cast("double"))), 6).as("mce"))
  }

  private val eceSql =
    s"""WITH $scoredSql,
        b AS (SELECT event_type, least(9, CAST(floor(score * 10) AS BIGINT)) AS bin,
                     count(*) AS n,
                     CAST(sum(CAST(round(score * 10000, 0) AS BIGINT)) AS BIGINT) AS s4,
                     CAST(sum(label) AS BIGINT) AS pos
              FROM scored GROUP BY GROUPING SETS ((event_type, bin), (bin)))
        SELECT coalesce(event_type, 'ALL') AS event_type,
               CAST(sum(n) AS BIGINT) AS n,
               round(CAST(sum(abs(pos * 10000 - s4)) AS BIGINT)
                     / (1e4 * CAST(sum(n) AS DOUBLE)), 6) AS ece,
               round(max(CAST(abs(pos * 10000 - s4) AS DOUBLE)
                         / (1e4 * CAST(n AS DOUBLE))), 6) AS mce
        FROM b GROUP BY 1"""

  // ---- regression metrics per slice (the reference's CV scoring) ---------
  // ME / MAE / MSE / RMSE of a deterministic predictor against `value`
  // (variography_uncertainty.py:714–719 computes exactly these four for
  // each cross-validation fold). Errors are 1e-3-quantized to integers:
  // sums and sums-of-squares stay < 2^63 at sf0.1 ×1000, so the aggregate
  // is exact under any merge order.
  private val regMetrics: Q = (s, d) => {
    val pred = col("value") * (lit(0.8) + lit(0.4) * Rand.u01(col("event_id"), 9404))
    val err3 = round((pred - col("value")) * 1000, 0).cast("long")
    scored(s, d).withColumn("e3", err3)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum(col("e3")).cast("double") / 1000.0 / count(lit(1)).cast("double"), 6).as("me"),
        round(sum(abs(col("e3"))).cast("double") / 1000.0 / count(lit(1)).cast("double"), 6).as("mae"),
        round(sum(col("e3") * col("e3")).cast("double") / 1e6 / count(lit(1)).cast("double"), 6).as("mse"),
        round(sqrt(sum(col("e3") * col("e3")).cast("double") / 1e6 / count(lit(1)).cast("double")), 6).as("rmse"))
  }

  private val regMetricsSql = {
    val u = Rand.u01Sql("event_id", 9404)
    s"""WITH $scoredSql,
        e AS (SELECT event_type,
                     CAST(round((value * (0.8 + 0.4 * ($u)) - value) * 1000, 0) AS BIGINT) AS e3
              FROM scored)
        SELECT event_type, count(*) AS n,
               round(CAST(CAST(sum(e3) AS BIGINT) AS DOUBLE) / 1000.0 / CAST(count(*) AS DOUBLE), 6) AS me,
               round(CAST(CAST(sum(abs(e3)) AS BIGINT) AS DOUBLE) / 1000.0 / CAST(count(*) AS DOUBLE), 6) AS mae,
               round(CAST(CAST(sum(e3 * e3) AS BIGINT) AS DOUBLE) / 1e6 / CAST(count(*) AS DOUBLE), 6) AS mse,
               round(sqrt(CAST(CAST(sum(e3 * e3) AS BIGINT) AS DOUBLE) / 1e6 / CAST(count(*) AS DOUBLE)), 6) AS rmse
        FROM e GROUP BY 1"""
  }

  // ---- decile lift / cumulative capture ----------------------------------
  // ntile(10) by score within each slice (windows partition by slice — no
  // global sort), then per-decile positive rate and cumulative capture of
  // all positives. The second window runs over 10 rows per slice.
  private val lift: Q = (s, d) => {
    val t = scored(s, d).withColumn("decile",
      ntile(10).over(Window.partitionBy("event_type")
        .orderBy(col("score").desc, col("event_id").asc)).cast("long"))
    val g = t.groupBy("event_type", "decile")
      .agg(count(lit(1)).as("n"), sum("label").cast("long").as("pos"))
    val wCum = Window.partitionBy("event_type").orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("event_type")
    g.select(col("event_type"), col("decile"), col("n"), col("pos"),
      round(col("pos").cast("double") / col("n").cast("double"), 6).as("pos_rate"),
      round(sum(col("pos")).over(wCum).cast("double") /
        sum(col("pos")).over(wAll).cast("double"), 6).as("capture"))
  }

  private val liftSql =
    s"""WITH $scoredSql,
        t AS (SELECT event_type, label,
                     CAST(ntile(10) OVER (PARTITION BY event_type
                            ORDER BY score DESC, event_id ASC) AS BIGINT) AS decile
              FROM scored),
        g AS (SELECT event_type, decile, count(*) AS n,
                     CAST(sum(label) AS BIGINT) AS pos
              FROM t GROUP BY 1, 2)
        SELECT event_type, decile, n, pos,
               round(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS pos_rate,
               round(CAST(sum(pos) OVER (PARTITION BY event_type ORDER BY decile
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                     / CAST(sum(pos) OVER (PARTITION BY event_type) AS DOUBLE), 6) AS capture
        FROM g"""

  // ---- ROC curve points per slice ----------------------------------------
  // TPR/FPR at 2-decimal score thresholds: one hash-aggregate over
  // (slice, bin) groups — ≤100 rows per slice into the cumulative window
  // regardless of table size (same bounded-window posture as AUC). The
  // cumulative-from-the-top sums ARE the confusion counts at threshold
  // bin/100 (predict positive when score ≥ threshold); all counts are
  // exact integers, the rates exact-rational divisions.
  private val rocPoints: Q = (s, d) => {
    val t = scored(s, d).withColumn("bin",
      least(lit(99L), floor(col("score") * 100).cast("long")))
    val g = t.groupBy("event_type", "bin")
      .agg(count(lit(1)).as("n"), sum("label").cast("long").as("pos"))
    val wCum = Window.partitionBy("event_type").orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("event_type")
    g.select(col("event_type"), col("bin"),
        sum(col("pos")).over(wCum).as("tp"),
        (sum(col("n")).over(wCum) - sum(col("pos")).over(wCum)).as("fp"),
        sum(col("pos")).over(wAll).as("p"),
        (sum(col("n")).over(wAll) - sum(col("pos")).over(wAll)).as("nn"))
      .select(col("event_type"), col("bin"), col("tp"), col("fp"),
        round(col("tp").cast("double") / col("p").cast("double"), 6).as("tpr"),
        round(col("fp").cast("double") / col("nn").cast("double"), 6).as("fpr"))
  }

  private val rocPointsSql =
    s"""WITH $scoredSql,
        t AS (SELECT event_type, least(99, CAST(floor(score * 100) AS BIGINT)) AS bin,
                     label
              FROM scored),
        g AS (SELECT event_type, bin, count(*) AS n,
                     CAST(sum(label) AS BIGINT) AS pos
              FROM t GROUP BY 1, 2),
        c AS (SELECT event_type, bin,
                     CAST(sum(pos) OVER (PARTITION BY event_type ORDER BY bin DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
                     CAST(sum(n) OVER (PARTITION BY event_type ORDER BY bin DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          - sum(pos) OVER (PARTITION BY event_type ORDER BY bin DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp,
                     CAST(sum(pos) OVER (PARTITION BY event_type) AS BIGINT) AS p,
                     CAST(sum(n) OVER (PARTITION BY event_type)
                          - sum(pos) OVER (PARTITION BY event_type) AS BIGINT) AS nn
              FROM g)
        SELECT event_type, bin, tp, fp,
               round(CAST(tp AS DOUBLE) / CAST(p AS DOUBLE), 6) AS tpr,
               round(CAST(fp AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS fpr
        FROM c"""

  // ---- PR-AUC (average precision, trapezoid) per slice -------------------
  // Companion to m_roc_points over the same ≤100 cumulative score bins:
  // PR-AUC = Σ (R_i − R_{i−1})·(P_i + P_{i−1})/2 walking thresholds from
  // high to low, anchored at (R,P) = (0,1). Per-bin trapezoid terms are
  // floored to 1e-12 integers so the per-slice sum is exact under any
  // merge order; the windows see only bin rows, never the raw stream.
  private val prAuc: Q = (s, d) => {
    val t = scored(s, d).withColumn("bin",
      least(lit(99L), floor(col("score") * 100).cast("long")))
    val g = t.groupBy("event_type", "bin")
      .agg(count(lit(1)).as("n"), sum("label").cast("long").as("pos"))
    val wCum = Window.partitionBy("event_type").orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("event_type")
    val wLag = Window.partitionBy("event_type").orderBy(col("bin").desc)
    val c = g.select(col("event_type"), col("bin"),
        sum(col("pos")).over(wCum).as("tp"),
        (sum(col("n")).over(wCum) - sum(col("pos")).over(wCum)).as("fp"),
        sum(col("pos")).over(wAll).as("p"))
      .withColumn("ptp", lag("tp", 1, 0L).over(wLag))
      .withColumn("pfp", lag("fp", 1, 0L).over(wLag))
    val recall = col("tp").cast("double") / col("p").cast("double")
    val pRecall = col("ptp").cast("double") / col("p").cast("double")
    val prec = col("tp").cast("double") /
      (col("tp") + col("fp")).cast("double")
    val pPrec = when(col("ptp") + col("pfp") === 0, lit(1.0))
      .otherwise(col("ptp").cast("double") /
        (col("ptp") + col("pfp")).cast("double"))
    c.select(col("event_type"), col("p"),
        floor((recall - pRecall) * ((prec + pPrec) / 2.0) * 1e12)
          .cast("long").as("term_q"))
      .groupBy("event_type")
      .agg(max("p").as("n_pos"),
        round(sum("term_q").cast("double") / 1e12, 6).as("pr_auc"))
  }

  private val prAucSql =
    s"""WITH $scoredSql,
        t AS (SELECT event_type, least(99, CAST(floor(score * 100) AS BIGINT)) AS bin,
                     label
              FROM scored),
        g AS (SELECT event_type, bin, count(*) AS n,
                     CAST(sum(label) AS BIGINT) AS pos
              FROM t GROUP BY 1, 2),
        c AS (SELECT event_type, bin,
                     CAST(sum(pos) OVER (PARTITION BY event_type ORDER BY bin DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
                     CAST(sum(n) OVER (PARTITION BY event_type ORDER BY bin DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          - sum(pos) OVER (PARTITION BY event_type ORDER BY bin DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp,
                     CAST(sum(pos) OVER (PARTITION BY event_type) AS BIGINT) AS p
              FROM g),
        l AS (SELECT c.*,
                     CAST(coalesce(lag(tp) OVER (PARTITION BY event_type ORDER BY bin DESC), 0) AS BIGINT) AS ptp,
                     CAST(coalesce(lag(fp) OVER (PARTITION BY event_type ORDER BY bin DESC), 0) AS BIGINT) AS pfp
              FROM c),
        terms AS (SELECT event_type, p,
                         CAST(floor((CAST(tp AS DOUBLE) / CAST(p AS DOUBLE)
                                     - CAST(ptp AS DOUBLE) / CAST(p AS DOUBLE))
                                    * ((CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
                                        + CASE WHEN ptp + pfp = 0 THEN 1.0
                                               ELSE CAST(ptp AS DOUBLE) / CAST(ptp + pfp AS DOUBLE) END)
                                       / 2.0) * 1e12) AS BIGINT) AS term_q
                  FROM l)
        SELECT event_type, max(p) AS n_pos,
               round(CAST(sum(term_q) AS BIGINT) / 1e12, 6) AS pr_auc
        FROM terms GROUP BY 1"""

  // ---- discriminative KS statistic per slice -----------------------------
  // KS = max over thresholds |CDF_pos(t) − CDF_neg(t)| between the
  // positive- and negative-class score distributions — the standard
  // separation/drift statistic in model monitoring. The maximized
  // difference is compared as the INTEGER |cp·N − cn·P| (cross-multiplied
  // to a common P·N denominator; < 2^52 at any tested SF), so the argmax
  // is exact — no float comparisons pick the winning threshold. Windows
  // run over (slice, score) groups: bounded input at any table size.
  private val ksScore: Q = (s, d) => {
    val g = scored(s, d).groupBy("event_type", "score")
      .agg(count(lit(1)).as("n"), sum("label").cast("long").as("pos"))
    val wCum = Window.partitionBy("event_type").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("event_type")
    val c = g.select(col("event_type"), col("score"),
      sum(col("pos")).over(wCum).as("cp"),
      (sum(col("n")).over(wCum) - sum(col("pos")).over(wCum)).as("cn"),
      sum(col("pos")).over(wAll).as("p"),
      (sum(col("n")).over(wAll) - sum(col("pos")).over(wAll)).as("nn"))
    c.withColumn("dnum", abs(col("cp") * col("nn") - col("cn") * col("p")))
      .withColumn("rn", row_number().over(Window.partitionBy("event_type")
        .orderBy(col("dnum").desc, col("score").asc)))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("p").as("pos"), col("nn").as("neg"),
        round(col("dnum").cast("double") /
          (col("p") * col("nn")).cast("double"), 6).as("ks"),
        col("score").as("ks_at"))
  }

  private val ksScoreSql =
    s"""WITH $scoredSql,
        g AS (SELECT event_type, score, count(*) AS n,
                     CAST(sum(label) AS BIGINT) AS pos
              FROM scored GROUP BY 1, 2),
        c AS (SELECT event_type, score,
                     CAST(sum(pos) OVER (PARTITION BY event_type ORDER BY score
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cp,
                     CAST(sum(n) OVER (PARTITION BY event_type ORDER BY score
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          - sum(pos) OVER (PARTITION BY event_type ORDER BY score
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
                     CAST(sum(pos) OVER (PARTITION BY event_type) AS BIGINT) AS p,
                     CAST(sum(n) OVER (PARTITION BY event_type)
                          - sum(pos) OVER (PARTITION BY event_type) AS BIGINT) AS nn
              FROM g),
        k AS (SELECT event_type, score, p, nn, abs(cp * nn - cn * p) AS dnum,
                     row_number() OVER (PARTITION BY event_type
                       ORDER BY abs(cp * nn - cn * p) DESC, score ASC) AS rn
              FROM c)
        SELECT event_type, p AS pos, nn AS neg,
               round(CAST(dnum AS DOUBLE) / CAST(p * nn AS DOUBLE), 6) AS ks,
               score AS ks_at
        FROM k WHERE rn = 1"""

  // ---- Brier score per slice ---------------------------------------------
  // mean((score − label)²) — the strictly-proper probabilistic-forecast
  // score that complements AUC (discrimination) and the calibration bins
  // (reliability). Scores are 4-decimal, so each squared error is
  // 1e-8-quantized to an exact integer before summing (both engines
  // compute the same x·x double and land on the same integer); the
  // aggregate is exact under any merge order.
  private val brier: Q = (s, d) => {
    val e = col("score") - col("label").cast("double")
    scored(s, d)
      .withColumn("e8", round(e * e * 1e8, 0).cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("label").cast("long").as("pos"),
        round(sum(col("e8")).cast("double") / 1e8 /
          count(lit(1)).cast("double"), 6).as("brier"))
  }

  private val brierSql =
    s"""WITH $scoredSql,
        e AS (SELECT event_type, label,
                     CAST(round((score - CAST(label AS DOUBLE))
                                * (score - CAST(label AS DOUBLE)) * 1e8, 0)
                          AS BIGINT) AS e8
              FROM scored)
        SELECT event_type, count(*) AS n, CAST(sum(label) AS BIGINT) AS pos,
               round(CAST(CAST(sum(e8) AS BIGINT) AS DOUBLE) / 1e8
                     / CAST(count(*) AS DOUBLE), 6) AS brier
        FROM e GROUP BY 1"""

  val queries: Map[String, Q] = Map(
    "m_brier" -> brier,
    "m_confusion" -> confusion,
    "m_kappa" -> kappa,
    "m_psi" -> psi,
    "m_prf1" -> prf1,
    "m_auc" -> auc,
    "m_calibration" -> calibration,
    "m_ece" -> ece,
    "m_reg_metrics" -> regMetrics,
    "m_lift_deciles" -> lift,
    "m_roc_points" -> rocPoints,
    "m_pr_auc" -> prAuc,
    "m_ks_score" -> ksScore,
  )

  val oracle: Map[String, String] = Map(
    "m_brier" -> brierSql,
    "m_confusion" -> confusionSql,
    "m_kappa" -> kappaSql,
    "m_psi" -> psiSql,
    "m_prf1" -> prf1Sql,
    "m_auc" -> aucSql,
    "m_calibration" -> calibrationSql,
    "m_ece" -> eceSql,
    "m_reg_metrics" -> regMetricsSql,
    "m_lift_deciles" -> liftSql,
    "m_roc_points" -> rocPointsSql,
    "m_pr_auc" -> prAucSql,
    "m_ks_score" -> ksScoreSql,
  )
}
