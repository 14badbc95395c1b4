package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed EXACT quantile with linear interpolation (numpy /
  * quantile_cont semantics) via rank-selection instead of Spark's
  * `Percentile` buffer aggregate.
  *
  * `Percentile` materializes every value into a per-partition heap and
  * merges them on one thread — fine for grouped small data, hopeless for a
  * tail quantile of a 100-TB column. Selecting the order statistics with
  * `orderBy(...).limit(k)` instead plans as TakeOrderedAndProject:
  * per-partition top-k, driver merges k rows — O(n log k) work, no full
  * shuffle, no big collect. For p near 1 the sort flips descending so
  * k stays ~(1−p)·n. (A 100-TB extreme would binary-search value ranges
  * instead; this covers the p∈[0.01, 0.99] clip quantiles.)
  */
object ExactQuantile {

  /** Exact interpolated quantile of `c` (no NULLs expected). Runs 2 tiny
    * TopK jobs + one count. */
  def quantile(df: DataFrame, c: String, p: Double): Double = {
    val n = df.count()
    require(n > 0, "quantile of empty relation")
    val pos = p * (n - 1)
    val lo = math.floor(pos).toLong
    val hi = math.ceil(pos).toLong
    val frac = pos - lo
    def nthAsc(i: Long): Double = {
      val k = math.min(i + 1, n - i) // rows the TopK must retain
      require(k <= Int.MaxValue,
        s"rank-selection needs a top-$k limit which overflows Int " +
          s"(n=$n, p=$p); use an approximate quantile or a value-range " +
          "binary search for quantiles this deep into a huge relation")
      if (i < n - i) // fetch from the front
        df.select(col(c)).orderBy(col(c).asc).limit((i + 1).toInt)
          .agg(max(c)).head().getDouble(0)
      else // fetch from the back: asc position i = desc position n-1-i
        df.select(col(c)).orderBy(col(c).desc).limit((n - i).toInt)
          .agg(min(c)).head().getDouble(0)
    }
    val vLo = nthAsc(lo)
    val vHi = if (hi == lo) vLo else nthAsc(hi)
    vLo + (vHi - vLo) * frac
  }
}
