package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Iterate

/** Degenerate-input regression tests for the shared termination
  * primitive and EVERY query that adopted it (round-9 verdict "do this"
  * #1): an empty iterate / empty graph / stencil-starved grid is a LEGAL
  * input whose fixpoint is the empty relation — never a crash. The
  * original defect: `untilDelta`'s convergence probe read
  * `sum(abs(...)).head.getDouble(0)` and `sum` over an empty join is
  * NULL, so `t_flow_accum` (whose `Terrain.flowD8` full 3x3 stencil
  * yields 0 cells on the sf0.001 grid of 1,843 pixels) crashed with
  * ROW_VALUE_IS_NULL at query-construction time. A NULL delta over an
  * empty iterate IS a fixpoint (the chk.isEmpty branch in
  * Iterate.scala); over a NON-empty iterate it is key churn and fails
  * loudly.
  */
class IterateDegenerateSpec extends SparkSuite {
  import spark.implicits._

  private def emptyRanks: DataFrame =
    Seq.empty[(Long, Double)].toDF("src", "r")

  test("untilDelta over an EMPTY iterate survives the probe (delta = 0, no crash)") {
    // step keeps the frame empty; checkEvery = 2 + eps > 0 forces the
    // probe to run (r14: eps = 0 skips the probe entirely — the exit
    // can never fire there, so the fixed-round path pays no probe job)
    val fp = Iterate.untilDelta(emptyRanks, maxRounds = 4, eps = 1e-300,
      checkEvery = 2, tag = "empty-test")(identity)
    assert(fp.result.count() == 0L)
    assert(fp.rounds == 2, "an empty iterate is a fixpoint: first probe exits")
    assert(fp.lastDelta == 0.0, "empty-join delta must coalesce to 0.0, not NULL")
  }

  test("untilDelta with eps = 0 runs the full budget and never probes") {
    val fp = Iterate.untilDelta(emptyRanks, maxRounds = 4, eps = 0.0,
      checkEvery = 2, tag = "fixed-test")(identity)
    assert(fp.result.count() == 0L)
    assert(fp.rounds == 4, "eps = 0 must still run the full fixed budget")
    assert(fp.lastDelta.isNaN, "fixed-round mode reports no delta (probe skipped)")
  }

  test("untilDelta with eps > 0 exits at the first probe on an empty iterate") {
    val fp = Iterate.untilDelta(emptyRanks, maxRounds = 50, eps = 1e-9,
      checkEvery = 2, tag = "empty-eps-test")(identity)
    assert(fp.rounds == 2, "an empty iterate is a fixpoint: first probe exits")
    assert(fp.result.count() == 0L)
  }

  test("untilDelta composite-key empty iterate (the flow_accum shape)") {
    val r0 = Seq.empty[(Int, Int, Long)].toDF("c", "r", "a")
    val fp = Iterate.untilDelta(r0, maxRounds = 4, eps = 1e-300,
      keyCols = Seq("c", "r"), valCol = "a", tag = "empty-cells")(identity)
    assert(fp.result.count() == 0L && fp.lastDelta == 0.0)
  }

  test("untilDelta fails LOUDLY when a non-empty iterate fully churns its keys") {
    // a NULL delta with a NON-empty iterate is key churn between rounds,
    // not convergence (ADVICE r10): declaring a fixpoint there would be
    // silent garbage (probe runs in convergence mode, eps > 0)
    val r0 = Seq((1L, 1.0)).toDF("src", "r")
    val e = intercept[IllegalStateException] {
      Iterate.untilDelta(r0, maxRounds = 4, eps = 1e-9, checkEvery = 2,
        tag = "churn-test") { df =>
        df.select((col("src") + 1).as("src"), col("r"))
      }
    }
    assert(e.getMessage.contains("key churn"))
  }

  test("untilEmptyDelta over an empty state converges at round 1") {
    val s0 = Seq.empty[(Long, Long)].toDF("src", "dst")
    val fp = Iterate.untilEmptyDelta(s0, maxRounds = 6, tag = "empty-peel") {
      s => (s, s.limit(0)) }
    assert(fp.rounds == 1 && fp.lastDelta == 0.0)
    assert(fp.result.count() == 0L)
  }

  // ---- adopter-level regressions ----------------------------------------

  test("t_flow_accum builds AND evaluates at sf0.001 (stencil-starved grid -> empty result)") {
    // the exact reproduction from the round-9 verdict: 1,843-pixel grid,
    // flowD8's full 3x3 stencil yields zero cells, acc0 is empty
    val df = SparkEntry.queries("t_flow_accum")(spark, sf001)
    assert(df.count() == 0L, "sf0.001 flow accumulation is legally empty")
  }

  /** Zero-row orders + lineitem with the real schemas: the empty graph. */
  private lazy val emptyGraphDir: String = {
    val dir = Files.createTempDirectory("graft-empty-graph").toFile
    dir.deleteOnExit()
    val d = dir.getAbsolutePath
    Seq("orders", "lineitem", "customer").foreach { t =>
      spark.read.parquet(s"$sf001/$t.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    d
  }

  for (q <- Seq("g_pagerank", "g_pagerank6", "g_ppr", "g_labelprop")) {
    test(s"$q survives an EMPTY graph (zero-row orders/lineitem)") {
      val df = SparkEntry.queries(q)(spark, emptyGraphDir)
      assert(df.count() == 0L, s"$q on an empty graph must be empty, not a crash")
    }
  }

  test("g_kcore survives an EMPTY graph (census of zeros, peel exits round 1)") {
    val rows = SparkEntry.queries("g_kcore")(spark, emptyGraphDir).collect()
    assert(rows.length == 2, "one census row per k in {2, 3}")
    assert(rows.forall(r => r.getAs[Long]("n_nodes") == 0L &&
      r.getAs[Long]("n_edges") == 0L && r.getAs[Long]("max_deg") == 0L))
  }
}
