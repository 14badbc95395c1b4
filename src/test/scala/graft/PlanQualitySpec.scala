package graft

import org.apache.spark.sql.DataFrame
import graft.queries.{QueriesExt, QueriesExt2, QueriesAnn}

/** Physical-plan assertions for the round-2 operators: correctness tests
  * prove the VALUES; these prove the PLAN is the one that survives a 100×
  * scale-up — small sides broadcast, rank-limits push down, generators
  * stay map-side. Each assertion names the scale property it guards.
  */
class PlanQualitySpec extends SparkSuite {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def run(qs: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame],
                  name: String): String = plan(qs(name)(spark, sf001))

  test("x_tfidf: document frequencies broadcast back onto tf (no sort-merge)") {
    val p = run(QueriesExt.queries, "x_tfidf")
    assert(p.contains("BroadcastHashJoin"),
      s"df-side join should broadcast:\n$p")
  }

  test("o_range_join: probe intervals broadcast; events never shuffle for the join") {
    val p = run(QueriesExt.queries, "o_range_join")
    assert(p.contains("BroadcastHashJoin"),
      s"probe side should broadcast:\n$p")
  }

  test("w_topk_group: rank-limit pushes below the final sort (WindowGroupLimit)") {
    val p = run(QueriesExt.queries, "w_topk_group")
    assert(p.contains("WindowGroupLimit"),
      s"row_number<=k should plan a WindowGroupLimit partial prune:\n$p")
  }

  test("a_unpivot: stack() is a map-side generator — exactly one exchange (the agg)") {
    val p = run(QueriesExt2.queries, "a_unpivot")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(p.contains("Generate"), s"expected generator:\n$p")
    assert(exchanges <= 2, // partial→final agg exchange only (AQE may add one read)
      s"unpivot should not shuffle row data before aggregating ($exchanges exchanges):\n$p")
  }

  test("n_pq_adc: code table joins LUT via broadcast (LUT is O(queries·M·K))") {
    val p = run(QueriesAnn.queries, "n_pq_adc")
    assert(p.contains("BroadcastHashJoin"),
      s"LUT should broadcast:\n$p")
  }

  test("s_filter_project: predicate and projection reach the parquet scan") {
    val p = run(graft.queries.QueriesCore.queries, "s_filter_project")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      s"filters should push into the scan:\n$p")
  }

  test("s_percentile_clip: no rank-selection limit in the plan (bisection path)") {
    // the clip quantiles come from value-range bisection (scan+count probes),
    // so the final plan must not retain a TakeOrdered with k ≈ p·n rows
    val p = run(graft.queries.QueriesCore.queries, "s_percentile_clip")
    assert(!p.contains("TakeOrderedAndProject"),
      s"clip quantiles must not plan a data-sized TakeOrdered:\n$p")
  }

  test("bounded-window discipline: every unpartitioned WindowExec sits above an aggregate or limit") {
    // a Window with no PARTITION BY funnels its whole input through one
    // reducer — acceptable ONLY above an aggregate/limit whose output is
    // provably bounded (score bins, top-k, scalar totals). Walk every
    // query's physical plan so a future unbounded one cannot hide.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec, LocalLimitExec, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def flatten(p: SparkPlan): Seq[SparkPlan] =
      p +: (p match {
        case a: AdaptiveSparkPlanExec => flatten(a.inputPlan)
        case o => (o.children ++ o.subqueries).flatMap(flatten)
      })
    def bounded(p: SparkPlan): Boolean = flatten(p).exists {
      case _: BaseAggregateExec | _: GlobalLimitExec | _: LocalLimitExec |
          _: TakeOrderedAndProjectExec | _: CollectLimitExec => true
      case _ => false
    }
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try flatten(fn(spark, sf001).queryExecution.executedPlan).foreach {
        case w: WindowExec if w.partitionSpec.isEmpty && !bounded(w.child) =>
          offenders += s"$name: Window ${w.windowExpression.mkString(",").take(100)}"
        case _ => ()
      } catch {
        case e: Throwable => offenders += s"$name: plan build failed: ${e.getMessage}"
      }
    }
    assert(offenders.isEmpty,
      s"unbounded whole-table windows (or unplannable queries):\n${offenders.mkString("\n")}")
  }

  test("binned range join degrades to a partitioned equi-join when nothing broadcasts") {
    // o_range_join's bin decomposition is what makes a range join
    // shuffle-partitionable: with broadcast disabled (the both-sides-huge
    // case), the same query must still plan an EQUI join on the bin key —
    // never a BroadcastNestedLoopJoin or CartesianProduct, which is what
    // a naive t0 <= ts < t1 range predicate alone would produce.
    import org.apache.spark.sql.functions._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ev = Tables.events(spark, sf001).select("event_id", "ts", "value")
      val probes = ev.filter(col("event_id") % 997 === 0)
        .select(col("event_id").as("probe_id"), col("ts").as("t0"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("t1"))
        .withColumn("bkt", explode(sequence(
          expr("unix_micros(t0) div 3600000000"),
          expr("unix_micros(t1) div 3600000000"))))
      val eb = ev.withColumn("bkt", expr("unix_micros(ts) div 3600000000"))
      val j = eb.join(probes, "bkt")
        .filter(col("ts") >= col("t0") && col("ts") < col("t1"))
        .groupBy("probe_id").agg(count(lit(1)).as("n"))
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"binned range join must not plan a pair-space join:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a partitioned equi-join on the bin key:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed co-located join + same-key agg: ZERO exchanges end to end") {
    // The 100-TB repeated-join shape: pre-bucketing both fact tables on
    // the join key makes every later join/aggregate on that key
    // exchange-free — the scan's HashPartitioning(bucket cols) satisfies
    // the join AND the same-key aggregate. Broadcast is disabled so the
    // test proves co-location, not small-side luck.
    import org.apache.spark.sql.functions._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf001).select("o_orderkey", "o_custkey")
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("pq_orders_b")
      Tables.lineitem(spark, sf001).select("l_orderkey", "l_quantity")
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("pq_lineitem_b")
      val j = spark.table("pq_lineitem_b")
        .join(spark.table("pq_orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
      val p = j.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(p).length
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
      assert(exchanges == 0,
        s"bucketed join+agg should be exchange-free ($exchanges found):\n$p")
      // and it still computes the right thing
      val viaBuckets = j.agg(count(lit(1)), sum("qty")).head()
      val direct = Tables.lineitem(spark, sf001)
        .join(Tables.orders(spark, sf001),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
        .agg(count(lit(1)), sum("qty")).head()
      assert(viaBuckets == direct)
    } finally {
      spark.sql("DROP TABLE IF EXISTS pq_orders_b")
      spark.sql("DROP TABLE IF EXISTS pq_lineitem_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
