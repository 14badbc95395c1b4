package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Convergence-driven iteration for keyed fixed-point computations
  * (PageRank, personalized PR, label propagation, flow accumulation —
  * any per-node value map refined by a superstep).
  *
  * The gate queries keep FIXED round counts (a hash gate needs pinned
  * results), but a real 100×-scale run cannot guess the round count up
  * front: this helper runs `step` until the L1 delta between consecutive
  * MATERIALIZED iterates drops below `eps`, or `maxRounds` is reached.
  *
  * Scale discipline (shared with the pagerank family, which delegates
  * its fixed-round path here with `eps = 0`):
  *  - `localCheckpoint` every `checkEvery` rounds truncates the
  *    join-chain lineage, so planning and any re-derivation stay O(1)
  *    per round instead of compounding (on a real cluster, reliable
  *    checkpointing replaces localCheckpoint);
  *  - the delta is a node-sized join of two ALREADY-COMPUTED frames,
  *    never a re-derivation of a lazy step, so the convergence probe
  *    costs ~nothing on top of the iteration itself;
  *  - the final round stays lazy, so the consumer's projection fuses
  *    into it (an early exit returns the materialized checkpoint).
  */
object Iterate {

  /** Result of [[untilDelta]]: the final iterate, the number of rounds
    * actually run, and the last observed L1 delta (NaN if no checkpoint
    * round was reached before maxRounds). */
  final case class Fixpoint(result: DataFrame, rounds: Int, lastDelta: Double)

  /** Iterate `step` from `r0` until `sum(abs(value - prev))` over
    * `keyCols` falls below `eps` at a checkpoint round, or `maxRounds`
    * rounds ran. `eps = 0` never exits early (deltas are >= 0), which
    * makes the fixed-round gate path and the convergence path ONE code
    * path. Integer value columns (label propagation's labels) are cast
    * to double for the delta only — any label move registers as a
    * positive delta, zero means fixpoint. Composite keys (flow
    * accumulation's (col, row) cells) join on all of `keyCols`. */
  def untilDelta(r0: DataFrame, maxRounds: Int, eps: Double,
                 checkEvery: Int = 2, keyCols: Seq[String] = Seq("src"),
                 valCol: String = "r", tag: String = "iterate")
                (step: DataFrame => DataFrame): Fixpoint = {
    require(maxRounds >= 1 && checkEvery >= 1 && eps >= 0, "bad iteration knobs")
    var lastChk = r0
    var r = r0
    var i = 0
    var lastDelta = Double.NaN
    while (i < maxRounds) {
      i += 1
      val nxt = step(r)
      r = if (i % checkEvery == 0 && i < maxRounds) {
        val chk = nxt.localCheckpoint(true)
        // r14: the delta probe only runs in CONVERGENCE mode (eps > 0).
        // With eps = 0 — the fixed-round gate path — deltas are >= 0, so
        // the exit test can never fire and the probe's node-sized join +
        // head was a pure extra job per checkpoint round (one per 2
        // supersteps across the whole graph family, at 100 TB a full
        // node-vector join each). The checkpoint itself stays: lineage
        // truncation is what keeps per-round planning O(1).
        if (eps > 0) {
          val dRow = chk.join(
              lastChk.select(keyCols.map(col) :+
                col(valCol).cast("double").as("__prev"): _*), keyCols)
            .agg(sum(abs(col(valCol).cast("double") - col("__prev"))).as("d"))
            .head
          // sum() over an EMPTY join is NULL. That is a fixpoint ONLY when
          // the iterate itself is empty (degenerate input — a grid too
          // small for the D8 stencil, an empty graph). A NON-empty iterate
          // sharing no keys with the previous checkpoint means the key set
          // churned between rounds — declaring convergence there would be
          // silent garbage, so fail loudly instead.
          val delta =
            if (!dRow.isNullAt(0)) dRow.getDouble(0)
            else if (chk.isEmpty) 0.0
            else throw new IllegalStateException(
              s"[graft.$tag] iter=$i: L1 delta undefined — the iterate is " +
                "non-empty but shares no keys with the previous checkpoint " +
                "(key churn between rounds); refusing to declare convergence")
          System.err.println(f"[graft.$tag%s] iter=$i%d l1_delta=$delta%.6f")
          lastChk = chk
          lastDelta = delta
          if (delta < eps) return Fixpoint(chk, i, delta)
        }
        chk
      } else nxt
    }
    Fixpoint(r, i, lastDelta)
  }

  /** PEEL-style iteration (k-core, pruning passes): `step` returns the
    * next state plus a DELTA frame (the elements removed/changed this
    * round, already materialized by the caller's sharing discipline);
    * the loop stops when the delta is EMPTY or after `maxRounds`. An
    * empty delta IS the fixpoint, so — unlike [[untilDelta]] — the
    * fixed-round gate path and the convergence path coincide with no
    * eps knob: further rounds are provably no-ops. */
  def untilEmptyDelta(s0: DataFrame, maxRounds: Int, tag: String = "peel")
                     (step: DataFrame => (DataFrame, DataFrame)): Fixpoint = {
    require(maxRounds >= 1, "bad iteration knobs")
    var s = s0
    var i = 0
    while (i < maxRounds) {
      i += 1
      val (nxt, delta) = step(s)
      if (delta.isEmpty) {
        System.err.println(s"[graft.$tag] iter=$i converged (empty delta)")
        return Fixpoint(s, i, 0.0)
      }
      s = nxt
    }
    Fixpoint(s, i, Double.NaN)
  }
}
