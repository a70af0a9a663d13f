package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-round synchronous minimum-label propagation over an
  * undirected graph.
  *
  * Unlike [[Components]] (which iterates to the connected-component
  * fixed point), this runs a CALLER-CHOSEN number of rounds and stops —
  * the community-detection / partial-convergence primitive: after `k`
  * rounds a node's label is the minimum node id within `k` hops, so the
  * label histogram measures how fast the graph contracts (tight
  * clusters collapse in 1-2 rounds, chains don't). Deterministic by
  * construction — min over longs, no tie-break dependence on
  * partitioning — so it carries a full unrolled SQL oracle (q177).
  *
  * Scale shape: each round is ONE shuffle keyed by the neighbor end of
  * the adjacency plus one join back on node id — the same dataflow as a
  * PageRank step. The adjacency is checkpointed once and re-read every
  * round; per-round label frames are eagerly checkpointed and the
  * superseded round's blocks released immediately (the [[KCore]] /
  * [[Components]] storage discipline — a long-lived driver must not
  * accumulate one pinned frame per round). The returned frame
  * references only the final round's checkpoint, so the consumer's
  * `Lineage.release(result)` frees everything that remains.
  */
object LabelProp {

  /** @param pairs undirected edge list; `aCol`/`bCol` are node-id
    *              columns castable to long. Self-loops are harmless
    *              (a node is already its own label candidate).
    * @param rounds number of synchronous propagation rounds (≥ 1).
    */
  def propagate(
      pairs: DataFrame,
      rounds: Int,
      aCol: String = "u",
      bCol: String = "v"): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e0 = pairs.select(col(aCol).cast("long").as("s"), col(bCol).cast("long").as("t"))
    // checkpointByKey on the neighbor end: every round's neighborhood
    // join is keyed on t, so the STATIONARY adjacency is laid out once
    // and only the |V|-row label projection shuffles per round.
    val adj = graft.core.Partitioning.checkpointByKey(
      e0.union(e0.select(col("t").as("s"), col("s").as("t")))
        .where(col("s").isNotNull && col("t").isNotNull)
        .distinct(),
      col("t"))

    // the init checkpoint is inside the try: if ITS job fails, the
    // already-materialized adj blocks must not outlive the call
    var labels: DataFrame = null
    try {
      // layout-preserving checkpoints throughout the loop: labels stay
      // node-hashed round over round, so the only per-round exchange is
      // the inherent t→s re-key of the neighborhood aggregation
      labels = graft.core.Partitioning.checkpointKeepingLayout(
        adj.select(col("s").as("node")).distinct()
          .select(col("node"), col("node").as("label")))
      for (_ <- 1 to rounds) {
        // min label over the open neighborhood; least() with the node's
        // own label makes the round closed-neighborhood (labels only
        // ever decrease). Every node appears as `s` in the
        // both-directions adjacency, so the join is inner, not outer.
        val nbrMin = adj
          .join(labels.select(col("node").as("t"), col("label").as("tl")), Seq("t"))
          .groupBy(col("s")).agg(min(col("tl")).as("nl"))
        val next = graft.core.Partitioning.checkpointKeepingLayout(labels
          .join(nbrMin.select(col("s").as("node"), col("nl")), Seq("node"))
          .select(col("node"), least(col("label"), col("nl")).as("label")))
        Lineage.release(labels) // superseded the moment `next` materialized
        labels = next
      }
    } catch {
      case e: Throwable =>
        if (labels != null) Lineage.release(labels)
        Lineage.release(adj); throw e
    }
    // the final labels are materialized (eager checkpoint) — the
    // adjacency's blocks are no longer referenced by anything
    Lineage.release(adj)
    labels
  }
}
