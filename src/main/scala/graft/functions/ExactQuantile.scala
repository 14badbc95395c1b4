package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.sql.graft.ColumnBridge

/** Order-preserving long image of a double: `doubleToLongBits`, with
  * negative bit patterns folded so signed-long ordering equals numeric
  * ordering (both zeros map to 0). Codegen-native so a radix-histogram
  * pass stays inside whole-stage codegen. */
case class DoubleBitsFolded(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a DOUBLE input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "double_bits_folded"

  override def nullSafeEval(input: Any): Any = {
    val b = java.lang.Double.doubleToLongBits(input.asInstanceOf[Double])
    if (b < 0) java.lang.Long.MIN_VALUE - b else b
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bits")
      s"""
        long $b = java.lang.Double.doubleToLongBits($c);
        ${ev.value} = ($b < 0L) ? (java.lang.Long.MIN_VALUE - $b) : $b;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

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

  /** Exact order statistic by VALUE-RANGE bisection — the 100-TB path the
    * rank-selection guard points at. Finds the i-th ascending value (0-based)
    * without sorting, shuffling, or collecting anything row-sized: each
    * iteration is one full-scan `count(value <= mid)` aggregate (a few bytes
    * to the driver), and the search interval halves on the FLOAT64 BIT
    * PATTERN, so it terminates in ≤64 probes with the exact value — no
    * epsilon, no interpolation error. Monotone bit-pattern trick: for
    * finite doubles, (sign-folded) long ordering equals numeric ordering.
    */
  def nthByBisection(df: DataFrame, c: String, i: Long): Double = {
    val v = col(c).cast("double")
    val row = df.agg(min(v), max(v), count(v)).head()
    val (lo0, hi0, n) = (row.getDouble(0), row.getDouble(1), row.getLong(2))
    require(i >= 0 && i < n, s"order statistic $i out of range [0, $n)")
    def toBits(d: Double): Long = {
      val b = java.lang.Double.doubleToLongBits(d)
      if (b < 0) Long.MinValue - b else b // fold negatives: order-preserving
    }
    def fromBits(l: Long): Double =
      java.lang.Double.longBitsToDouble(if (l < 0) Long.MinValue - l else l)
    var lo = toBits(lo0)
    var hi = toBits(hi0)
    // invariant: the answer key is in [lo, hi] — the smallest key whose
    // count(value <= key) exceeds i, which is exactly the i-th value's key
    // (count steps only at data values)
    while (lo < hi) {
      // overflow-free signed floor-average: hi - lo can exceed Long.MaxValue
      // when the keys straddle zero (e.g. min ≈ -1e18, max ≈ +1e18)
      val mid = (lo & hi) + ((lo ^ hi) >> 1)
      val cnt = df.filter(v <= fromBits(mid)).count()
      if (cnt <= i) lo = mid + 1 else hi = mid
    }
    fromBits(lo)
  }

  /** Interpolated quantile via [[nthByBisection]] — same numpy semantics
    * as [[quantile]], but every probe is a scan+count, so it works at any
    * depth of any relation size (≤ ~130 scans; in practice far fewer when
    * the value range is narrow). Prefer [[quantile]] when (1−p)·n or p·n
    * fits an Int; prefer this beyond that. */
  def quantileByBisection(df: DataFrame, c: String, p: Double): Double = {
    val n = df.count()
    require(n > 0, "quantile of empty relation")
    val pos = p * (n - 1)
    val lo = math.floor(pos).toLong
    val hi = math.ceil(pos).toLong
    val frac = pos - lo
    val vLo = nthByBisection(df, c, lo)
    val vHi = if (hi == lo) vLo else nthByBisection(df, c, hi)
    vLo + (vHi - vLo) * frac
  }

  /** BATCHED value-range bisection: all requested order statistics advance
    * in lockstep, one scan per round computing every active probe's
    * `count(value <= mid)` as parallel conditional sums in a single
    * aggregate. Total cost ≤ ~64 scans REGARDLESS of how many statistics
    * are requested (vs 64·k for k independent [[nthByBisection]] calls) —
    * this is the shape a multi-quantile clip wants at 100 TB. */
  def nthsByBisection(df: DataFrame, c: String, is: Seq[Long]): Map[Long, Double] = {
    if (is.isEmpty) return Map.empty
    val v = col(c).cast("double")
    val row = df.agg(min(v), max(v), count(v)).head()
    val (lo0, hi0, n) = (row.getDouble(0), row.getDouble(1), row.getLong(2))
    is.foreach(i => require(i >= 0 && i < n, s"order statistic $i out of range [0, $n)"))
    def toBits(d: Double): Long = {
      val b = java.lang.Double.doubleToLongBits(d)
      if (b < 0) Long.MinValue - b else b
    }
    def fromBits(l: Long): Double =
      java.lang.Double.longBitsToDouble(if (l < 0) Long.MinValue - l else l)
    var active = is.distinct.map(i => i -> ((toBits(lo0), toBits(hi0)))).toMap
    val done = scala.collection.mutable.Map.empty[Long, Double]
    while (active.nonEmpty) {
      val (conv, open) = active.partition { case (_, (lo, hi)) => lo >= hi }
      conv.foreach { case (i, (lo, _)) => done(i) = fromBits(lo) }
      if (open.isEmpty) { active = open }
      else {
        val probes = open.toSeq.map { case (i, (lo, hi)) =>
          (i, (lo & hi) + ((lo ^ hi) >> 1))
        }
        val aggs = probes.map { case (i, mid) =>
          sum(when(v <= fromBits(mid), 1L).otherwise(0L)).as(s"c$i")
        }
        val r = df.agg(aggs.head, aggs.tail: _*).head()
        active = probes.zipWithIndex.map { case ((i, mid), idx) =>
          val cnt = r.getLong(idx)
          val (lo, hi) = open(i)
          if (cnt <= i) i -> ((mid + 1, hi)) else i -> ((lo, mid))
        }.toMap
      }
    }
    done.toMap
  }

  /** Interpolated quantiles for several p at once via [[nthsByBisection]]
    * — one count + ≤ ~64 batched probe scans total. */
  def quantilesByBisection(df: DataFrame, c: String, ps: Seq[Double]): Map[Double, Double] = {
    val n = df.count()
    require(n > 0, "quantile of empty relation")
    val targets = ps.map { p =>
      val pos = p * (n - 1)
      (p, math.floor(pos).toLong, math.ceil(pos).toLong, pos - math.floor(pos))
    }
    val nths = nthsByBisection(df, c,
      targets.flatMap { case (_, lo, hi, _) => Seq(lo, hi) }.distinct)
    targets.map { case (p, lo, hi, frac) =>
      val vLo = nths(lo)
      val vHi = nths(hi)
      p -> (vLo + (vHi - vLo) * frac)
    }.toMap
  }

  private def fromFoldedBits(l: Long): Double =
    java.lang.Double.longBitsToDouble(if (l < 0) java.lang.Long.MIN_VALUE - l else l)

  /** Exact order statistics by MULTI-PASS RADIX SELECTION: EXACTLY 4
    * histogram scans (16 bits of the folded IEEE-754 pattern per pass)
    * regardless of data size, value distribution, or how many statistics
    * are requested. Each pass is an aggregation-only job — map-side
    * combining into ≤65536 buckets per live prefix, no sort, no row
    * shuffle, a few-KB collect — so this beats both the TakeOrdered form
    * (k≈p·n per-partition retention) and bisection (≤64 sequential probe
    * jobs). The preferred engine path for any quantile of anything big.
    * Requires a known total row count `n` of non-null `c` values (the
    * caller usually has it from the same agg that produced min/max).
    *
    * `hist48` lets a caller that already grouped the data by the top-16-bit
    * prefix (`double_bits_folded(c) >> 48`) hand that histogram in — the
    * first of the 4 scans is skipped, fusing e.g. a moment aggregate and
    * pass 1 into one job (Zonal.descriptiveStats does this). */
  def nthsByRadix(df: DataFrame, c: String, n: Long, is: Seq[Long],
      hist48: Option[Array[(Long, Long)]] = None): Map[Long, Double] = {
    if (is.isEmpty) return Map.empty
    is.foreach(i => require(i >= 0 && i < n, s"order statistic $i out of range [0, $n)"))
    val v = col(c).cast("double")
    val bits = ColumnBridge.column(DoubleBitsFolded(ColumnBridge.expression(v)))
    val base = df.select(bits.as("b")).where(col("b").isNotNull)
    val step = 16
    var shift = 64
    // per target rank: (prefix = resolved bits >> shift, rank within prefix)
    var st: Map[Long, (Long, Long)] = is.distinct.map(i => i -> ((0L, i))).toMap
    while (shift > 0) {
      val newShift = shift - step
      val live = st.values.map(_._1).toSet.toSeq
      val filtered =
        if (shift >= 64) base
        else base.where(shiftright(col("b"), shift).isin(live: _*))
      val hist =
        if (shift >= 64 && hist48.isDefined) hist48.get
        else filtered
          .groupBy(shiftright(col("b"), newShift).as("k"))
          .agg(count(lit(1)).as("cnt"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
      val byPrefix: Map[Long, Array[(Long, Long)]] =
        if (shift >= 64) Map(0L -> hist.sortBy(_._1))
        else hist.groupBy(_._1 >> step).map { case (p, a) => p -> a.sortBy(_._1) }
      st = st.map { case (i, (p, lr)) =>
        val buckets = byPrefix(p)
        var rem = lr
        var idx = 0
        while (rem >= buckets(idx)._2) { rem -= buckets(idx)._2; idx += 1 }
        i -> ((buckets(idx)._1, rem))
      }
      shift = newShift
    }
    st.map { case (i, (p, _)) => i -> fromFoldedBits(p) }
  }

  /** Grouped [[nthsByRadix]]: exact order statistics PER GROUP in the
    * same 4 histogram scans TOTAL (every group's probes advance in
    * lockstep inside one aggregate per pass). This removes the
    * per-group window sort a grouped quantile otherwise needs — with
    * few, data-heavy groups (zonal stats over 3–4 zones of a 100-TB
    * table) a `PARTITION BY zone` window funnels each zone through one
    * task, while this stays aggregation-only at every size. Contract:
    * the GROUP COUNT must be driver-bounded (each pass collects
    * ≤ groups × live-prefix histograms); ranks are 0-based among each
    * group's non-null `c` values. */
  def groupedNthsByRadix(df: DataFrame, g: String, c: String,
      ranks: Map[String, Seq[Long]]): Map[String, Map[Long, Double]] =
    groupedNthsByRadixWithAll(df, g, c, ranks, Nil, None)._1

  /** [[groupedNthsByRadix]] plus an ALL pseudo-group (ranks over the
    * whole relation, ignoring `g`) walked in the SAME passes — the ALL
    * histogram is the per-group histogram summed across groups, so the
    * combined selection still costs 4 scans total (3 with `hist48`).
    *
    * `hist48` hands in pass 1 pre-grouped by (group, bits>>48) — the
    * caller usually produced it from a scan that also computed moments
    * (Zonal.descriptiveStats fuses both into one job). */
  def groupedNthsByRadixWithAll(df: DataFrame, g: String, c: String,
      ranks: Map[String, Seq[Long]], allRanks: Seq[Long],
      hist48: Option[Array[(String, Long, Long)]])
      : (Map[String, Map[Long, Double]], Map[Long, Double]) = {
    type K = Option[String] // Some(group) | None = the ALL pseudo-group
    val wanted: Map[K, Seq[Long]] =
      ranks.filter(_._2.nonEmpty).map { case (k, v) => (Some(k): K) -> v } ++
        (if (allRanks.nonEmpty) Map((None: K) -> allRanks)
         else Map.empty[K, Seq[Long]])
    if (wanted.isEmpty)
      return (ranks.map { case (k, _) => k -> Map.empty[Long, Double] }, Map.empty)
    val v = col(c).cast("double")
    val bits = ColumnBridge.column(DoubleBitsFolded(ColumnBridge.expression(v)))
    val base = df.select(col(g).as("g"), bits.as("b")).where(col("b").isNotNull)
    val step = 16
    var shift = 64
    var st: Map[(K, Long), (Long, Long)] =
      wanted.toSeq.flatMap { case (k, is) =>
        is.distinct.map(i => (k, i) -> ((0L, i)))
      }.toMap
    while (shift > 0) {
      val newShift = shift - step
      // (group, child-bucket, count) — for pass 1 optionally handed in
      val hist: Array[(String, Long, Long)] =
        if (shift >= 64 && hist48.isDefined) hist48.get
        else {
          val liveByKey = st.toSeq.groupBy(_._1._1)
            .map { case (k, es) => k -> es.map(_._2._1).distinct }
          val filtered =
            if (shift >= 64) base
            else {
              // a row passes if ITS group's walk needs its prefix, or
              // the ALL walk does (no group constraint on that side)
              val conds = liveByKey.toSeq.map {
                case (Some(gv), ps) =>
                  // <=> not ===: a null group value must keep matching its
                  // own walk (=== is never true against NULL, which would
                  // starve passes 2–4 of that group's histogram rows)
                  (col("g") <=> lit(gv)) && shiftright(col("b"), shift).isin(ps: _*)
                case (None, ps) => shiftright(col("b"), shift).isin(ps: _*)
              }
              base.where(conds.reduce(_ || _))
            }
          filtered
            .groupBy(col("g"), shiftright(col("b"), newShift).as("k"))
            .agg(count(lit(1)).as("cnt"))
            .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        }
      def parent(k: Long): Long = if (shift >= 64) 0L else k >> step
      val perGroup: Map[(K, Long), Array[(Long, Long)]] =
        hist.groupBy(t => (Some(t._1): K, parent(t._2)))
          .map { case (k, a) => k -> a.map(t => (t._2, t._3)).sortBy(_._1) }
      // ALL buckets: per-group counts summed across groups, key order
      val allBuckets: Map[(K, Long), Array[(Long, Long)]] =
        if (!wanted.contains(None)) Map.empty
        else hist.groupBy(t => parent(t._2)).map { case (p, a) =>
          ((None: K, p),
            a.groupBy(_._2).map { case (k, rs) => (k, rs.map(_._3).sum) }
              .toArray.sortBy(_._1))
        }
      val buckets = perGroup ++ allBuckets
      st = st.map { case ((k, i), (p, lr)) =>
        val bs = buckets((k, p))
        var rem = lr
        var idx = 0
        while (rem >= bs(idx)._2) { rem -= bs(idx)._2; idx += 1 }
        (k, i) -> ((bs(idx)._1, rem))
      }
      shift = newShift
    }
    val zs = st.toSeq.collect { case ((Some(gv), i), (p, _)) => (gv, i, p) }
      .groupBy(_._1).map { case (gv, es) =>
        gv -> es.map(e => e._2 -> fromFoldedBits(e._3)).toMap
      }
    val all = st.toSeq.collect { case ((None, i), (p, _)) =>
      i -> fromFoldedBits(p) }.toMap
    (zs, all)
  }

  /** Interpolated quantiles for several p at once via [[nthsByRadix]] —
    * one count + exactly 4 histogram scans, independent of |ps|. */
  def quantilesByRadix(df: DataFrame, c: String, ps: Seq[Double]): Map[Double, Double] = {
    val n = df.where(col(c).isNotNull).count()
    require(n > 0, "quantile of empty relation")
    val targets = ps.map { p =>
      val pos = p * (n - 1)
      (p, math.floor(pos).toLong, math.ceil(pos).toLong, pos - math.floor(pos))
    }
    val nths = nthsByRadix(df, c, n,
      targets.flatMap { case (_, lo, hi, _) => Seq(lo, hi) }.distinct)
    targets.map { case (p, lo, hi, frac) =>
      val vLo = nths(lo)
      val vHi = nths(hi)
      p -> (vLo + (vHi - vLo) * frac)
    }.toMap
  }
}
