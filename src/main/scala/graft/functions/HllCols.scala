package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Canon.round

/** Column-expression and SQL builders for the md5-register HyperLogLog
  * sketch used by the oracle-gated sketch queries (`a_hll_est`,
  * `a_approx_sketches`). One definition of index/rank extraction and the
  * harmonic-sum estimate keeps the query family and its DuckDB oracles
  * from drifting; [[HllAgg]] is the typed-Aggregator twin of the same
  * math (HllAggSpec cross-validates register tables value-for-value).
  *
  * Everything here is deterministic and merge-order independent: the
  * per-register `max(rho)` is a lattice join, the estimate reads an exact
  * integer harmonic denominator Σ2^(49−M[j]), and the small-range
  * correction comes from the shared precomputed literal table — so the
  * estimate hash-matches across engines however the partial aggregates
  * are merged. That is what makes an approximate sketch exactly gateable.
  */
object HllCols {

  /** Register count m = 64: index = first md5 byte mod 64, rank from the
    * next 48 bits. */
  val M = 64

  /** Register index from an md5-hex column: first byte (2 hex digits)
    * mod 64. One hex parse per row (`conv` / `0x`-cast), not a per-digit
    * instr chain — 14 string ops fewer than the digit-wise form on the
    * query's hottest path. */
  def idx(m: Column): Column =
    conv(substring(m, 1, 2), 16, 10).cast("long") % M

  /** Rank ρ = leading-zero count of the next 48 hash bits + 1 (capped at
    * 49 for the all-zero word). */
  def rho(m: Column): Column = {
    val w48 = conv(substring(m, 3, 12), 16, 10).cast("long")
    when(w48 === 0L, lit(49)).otherwise(lit(49) - length(bin(w48)))
  }

  /** Estimate per group from a register table (groupCols + `r` = max ρ
    * per present index; ≤ M rows per group). Missing registers are
    * zero-registers: they contribute 2^49 each to the harmonic sum. */
  def estimate(regs: DataFrame, groupCols: Seq[String], out: String): DataFrame = {
    val smallArr = array(HllAgg.smallTab.toSeq.map(lit): _*)
    val sums = regs.groupBy(groupCols.map(col): _*)
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 49 - r)")).as("sp"),
        count(lit(1)).as("mp"))
      .select(groupCols.map(col) ++ Seq(
        (lit(M.toLong) - col("mp")).as("vz"),
        (col("sp") + (lit(M.toLong) - col("mp")) * lit(1L << 49)).as("sint")): _*)
    // α_m·m²·2^49 / sint, m = 64 (0.709·4096·2^49), small-range cutoff 2.5m
    val raw = (lit(0.709) * lit(4096.0) * lit(562949953421312.0)) /
      col("sint").cast("double")
    sums.select(groupCols.map(col) ++ Seq(
      when(raw <= 160.0 && col("vz") > 0,
        element_at(smallArr, col("vz").cast("int")))
        .otherwise(round(raw, 6)).as(out)): _*)
  }

  // ---- DuckDB-side fragments (the oracle mirror of the above) ----------

  def idxSql: String = s"(CAST('0x' || substr(m, 1, 2) AS BIGINT) % $M)"

  def w48Sql: String = s"CAST('0x' || substr(m, 3, 12) AS BIGINT)"

  def rhoSql: String =
    s"CASE WHEN ($w48Sql) = 0 THEN 49 ELSE 49 - length(bin($w48Sql)) END"

  /** `sums`-stage SQL: vz + exact integer sint from a register CTE with
    * column `r`, grouped by `groupCol`. */
  def sumsSql(regsCte: String, groupCol: String): String =
    s"""SELECT $groupCol,
               CAST($M - count(*) AS BIGINT) AS vz,
               CAST(sum(CAST(1 AS BIGINT) << (49 - r)) AS BIGINT)
                 + ($M - count(*)) * (CAST(1 AS BIGINT) << 49) AS sint
        FROM $regsCte GROUP BY 1"""

  /** Estimate expression over `sint`/`vz` (e0 suffixes: DuckDB parses
    * bare decimals as DECIMAL and overflows the multiply chain). */
  def estSql: String = {
    val smallList = HllAgg.smallTab.mkString("[", ", ", "]")
    s"""CASE WHEN ((0.709e0 * 4096e0) * 562949953421312e0)
                  / CAST(sint AS DOUBLE) <= 160e0 AND vz > 0
             THEN ($smallList)[CAST(vz AS INT)]
             ELSE round(((0.709e0 * 4096e0) * 562949953421312e0)
                        / CAST(sint AS DOUBLE), 6) END"""
  }
}
