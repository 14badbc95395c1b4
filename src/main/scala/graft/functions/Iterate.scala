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

  /** Iterate `step` from `r0` until `sum(abs(value - prev))` over `keyCol`
    * falls below `eps` at a checkpoint round, or `maxRounds` rounds ran.
    * `eps = 0` never exits early (deltas are >= 0), which makes the
    * fixed-round gate path and the convergence path ONE code path. */
  def untilDelta(r0: DataFrame, maxRounds: Int, eps: Double,
                 checkEvery: Int = 2, keyCol: String = "src",
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
        val delta = chk.join(
            lastChk.select(col(keyCol), col(valCol).as("__prev")), keyCol)
          .agg(sum(abs(col(valCol) - col("__prev"))).as("d"))
          .head.getDouble(0)
        System.err.println(f"[graft.$tag%s] iter=$i%d l1_delta=$delta%.6f")
        lastChk = chk
        lastDelta = delta
        if (delta < eps) return Fixpoint(chk, i, delta)
        chk
      } else nxt
    }
    Fixpoint(r, i, lastDelta)
  }
}
