package graft

import org.apache.spark.sql.functions._
import graft.functions.{QuantileSketch, QuantileSketchAgg, TDigestState}

/** The t-digest family's ACCURACY contract: the a_tdigest_quantiles
  * query (canonical-order construction, exactly oracle-gated since
  * round 5) must land within the δ=100 rank-error bound of the exact
  * order statistics, and the arbitrary-merge-order Aggregator twin
  * must keep tails exact and preserve the same bound across merges. */
class QuantileSketchSpec extends SparkSuite {

  private val QS = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
  private val TOL = 0.015 // δ=100 gives ~0.003 mid-quantile rank error

  private def rankOf(sorted: Array[Double], v: Double): Double =
    sorted.count(_ <= v).toDouble / sorted.length

  test("per-group rank error vs exact order statistics is within bound") {
    val rows = Tables.lineitem(spark, sf001)
      .select(col("l_returnflag"), col("l_extendedprice").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val byFlag = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap

    // long format since round 5: (l_returnflag, q, n_rows, est)
    val out = SparkEntry.queries("a_tdigest_quantiles")(spark, sf001).collect()
    assert(out.length == byFlag.size * QS.size)
    out.foreach { r =>
      val flag = r.getString(0)
      val q = r.getDouble(1)
      val sorted = byFlag(flag)
      assert(r.getLong(2) == sorted.length)
      val est = r.getDouble(3)
      val err = math.abs(rankOf(sorted, est) - q)
      assert(err <= TOL, s"flag=$flag q=$q est=$est rank_err=$err")
    }
  }

  test("tails are exact and merge preserves the rank bound") {
    val agg = new QuantileSketchAgg(100)
    val xs = (1 to 20000).map(i => math.sin(i * 12.9898) * 43758.5453 % 100.0)
    val (lo, hi) = xs.splitAt(xs.length / 3)
    def digest(vs: Seq[Double]) = vs.foldLeft(agg.zero)(agg.reduce)
    val merged = agg.finish(agg.merge(digest(lo), digest(hi)))

    assert(QuantileSketch.quantileOf(merged, 0.0) == xs.min)
    assert(QuantileSketch.quantileOf(merged, 1.0) == xs.max)
    assert(merged.n == xs.length)
    assert(merged.means.length <= 200, s"digest kept ${merged.means.length} centroids")

    val sorted = xs.sorted.toArray
    QS.foreach { q =>
      val est = QuantileSketch.quantileOf(merged, q)
      val err = math.abs(rankOf(sorted, est) - q)
      assert(err <= TOL, s"q=$q est=$est rank_err=$err")
    }
  }
}
