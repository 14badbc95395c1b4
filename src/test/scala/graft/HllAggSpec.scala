package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps

class HllAggSpec extends SparkSuite {

  test("HllAgg matches the oracle-gated a_hll_est query value-for-value") {
    // the Aggregator and the SQL-expression query build the SAME
    // registers from the SAME hash — two implementations, one answer
    val hll = udaf(graft.functions.HllAgg)
    val wd = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("source"), TextOps.words(col("text")).as("ws"))
      .select(col("source"), explode(TextOps.shinglesOf(col("ws"), 3)).as("g"))
      .distinct()
    val got = wd.groupBy("source").agg(hll(col("g")).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val q = graft.queries.QueriesText.queries("a_hll_est")(spark, sf001)
      .select("source", "hll_est").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == q)
  }

  test("HllAgg is merge-order invariant and insertion-idempotent") {
    val hll = udaf(graft.functions.HllAgg)
    val base = spark.range(0, 5000)
      .select(concat(lit("item"), col("id") % 1000).as("s"))
    val e1 = base.repartition(1).agg(hll(col("s"))).head().getDouble(0)
    val e13 = base.repartition(13).agg(hll(col("s"))).head().getDouble(0)
    assert(e1 == e13, s"partitioning changed the estimate: $e1 vs $e13")
    // duplicates cannot move the estimate — insertion is a register max
    val dedup = base.distinct().agg(hll(col("s"))).head().getDouble(0)
    assert(e1 == dedup, s"duplicates changed the estimate: $e1 vs $dedup")
    // and the estimate is in the right neighborhood of the true 1000
    assert(math.abs(e1 - 1000.0) / 1000.0 < 0.5, s"estimate $e1 far from 1000")
  }
}
