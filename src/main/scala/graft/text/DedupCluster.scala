package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive near-duplicate clustering: connected components over a
  * candidate-pair edge set (e.g. MinHash-LSH output), labeling every
  * document with the smallest doc id reachable from it. The dedup policy
  * "keep one representative per near-dup cluster" is then a groupBy on
  * the label.
  *
  * Algorithm: iterative min-label propagation (the standard large-graph
  * CC on Spark — each round is one join + aggregate, rounds =
  * O(log(component diameter)); near-dup components are tiny, so this
  * converges in 2–3 rounds). The loop is driver-orchestrated but every
  * step is a distributed join; nothing node-sized reaches the driver
  * except the convergence counter.
  */
object DedupCluster {

  /** `pairs(a_id, b_id)` undirected → `[doc_id, cluster_id]` where
    * cluster_id = min reachable id. Docs with no edges are absent
    * (their cluster is themselves). */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // localCheckpoint truncates lineage each round — without it every
    // iteration (and the final materialization) re-derives the whole
    // upstream pair pipeline, turning O(rounds) into O(rounds²) work.
    // (On a real cluster use reliable checkpointing instead of local.)
    // No distinct() on the symmetric union: candidate pairs arrive
    // deduplicated (LSH emits one row per (a,b) with a<b), and min-label
    // propagation is idempotent under duplicate edges — a distinct here
    // would only add a full edge-table shuffle.
    val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionAll(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .localCheckpoint(true)
    // Initial labels fuse the first propagation round: label₀ =
    // min(id, min neighbor) straight off the edge aggregate — one
    // groupBy instead of distinct-ids + join + aggregate.
    var labels = edges.groupBy(col("src").as("id")).agg(min("dst").as("m"))
      .select(col("id"), least(col("id"), col("m")).as("label"))
      .localCheckpoint(true)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // candidate label per node: min of own label and neighbors' labels.
      // The change flag rides in the checkpointed frame so convergence
      // detection is a scan of materialized rows, not another join.
      val nbr = edges.join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id")).agg(min("label").as("nlabel"))
      val prop = labels.join(nbr, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"),
          (coalesce(col("nlabel"), col("label")) < col("label")).as("chg"))
      // pointer jump (path halving): label ← label's own label. Labels are
      // always node ids, so the lookup is a self-join on the label-sized
      // frame — one bounded extra join that roughly halves the round count
      // (each round then covers 2 propagation hops). Termination stays
      // sound: a state unchanged by BOTH steps is a min-propagation fixed
      // point, which is exactly "every label is its component minimum".
      val next = prop.join(
          prop.select(col("id").as("jid"), col("label").as("jlabel")),
          col("label") === col("jid"), "left_outer")
        .select(col("id"),
          least(col("label"), coalesce(col("jlabel"), col("label"))).as("label"),
          (col("chg") ||
            coalesce(col("jlabel"), col("label")) < col("label")).as("chg"))
        .localCheckpoint(true)
      val changed = next.filter(col("chg")).count()
      labels = next.select("id", "label")
      converged = changed == 0
      it += 1
    }
    if (!converged)
      // a component with propagation diameter > maxIter would otherwise
      // be silently split into several cluster_ids
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxIter iterations; " +
          "raise maxIter (rounds needed ~ log2 of the largest component " +
          "diameter)")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }
}
