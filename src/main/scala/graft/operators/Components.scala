package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a pair list — the step that turns
  * near-duplicate PAIRS into duplicate GROUPS (one canonical survivor
  * per group, the rest dropped).
  *
  * Algorithm: iterative min-label propagation WITH pointer jumping.
  * Every node starts labeled with itself; each round, a node adopts
  * the minimum label in its closed neighborhood (one shuffle join
  * edges ⋈ labels + one groupBy(src) min), then labels are shortcut
  * one hop (label := label's label — a self-join on the label table,
  * which is far smaller than the edge set). Plain propagation needs
  * diameter-many rounds — chain-shaped near-dup components at tau-low
  * settings reach diameters in the tens — while the shortcut step
  * doubles the effective propagation distance per round, giving
  * O(log diameter) convergence (the classic pointer-jumping bound;
  * cf. two-phase CC algorithms like large-star/small-star). Each round
  * costs one more tiny join but the round count drops exponentially,
  * and rounds (driver-synchronized Spark jobs) are the scarce resource
  * at cluster scale.
  *
  * Determinism: labels are ids and min() is order-insensitive, so the
  * result is exactly reproducible — the DuckDB oracle replicates it
  * with a recursive transitive-closure CTE.
  */
object Components {

  /** @param pairs undirected edge list (one row per pair; direction and
    *   duplicates are normalized away here)
    * @return (node, component) — component = min node id reachable
    */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame = {
    val e0 = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    val edges = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Iterative dataflow MUST truncate lineage each round: chaining the
    // round-N plan onto round-N-1 doubles the logical tree per
    // iteration (2^rounds nodes — the first chain-graph test OOMed just
    // STRINGIFYING the plan). localCheckpoint materializes the round and
    // restarts the plan from the cached result; a cluster deployment
    // with executor churn would use reliable checkpoint() instead.
    var labels = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(true)

    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // min label over the closed neighborhood (self ∪ neighbors)
      val nbrMin = edges
        .join(labels.select(col("node").as("dst"), col("label").as("dst_label")), Seq("dst"))
        .groupBy(col("src")).agg(min(col("dst_label")).as("nbr_label"))
        .select(col("src").as("node"), col("nbr_label"))
      val propagated = labels
        .join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
      // pointer jumping: follow the label one hop (label := label(label));
      // labels only ever decrease, so taking the hop unconditionally is
      // safe and halves the remaining distance to the component min
      val next = propagated
        .join(
          propagated.select(col("node").as("label"), col("label").as("hop_label")),
          Seq("label"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("hop_label"), col("label"))).as("label"))
        .localCheckpoint(true)
      val changed = next
        .join(labels.select(col("node"), col("label").as("old_label")), Seq("node"))
        .where(col("label") =!= col("old_label"))
        .limit(1).count() > 0
      labels = next
      done = !changed
      iter += 1
    }
    require(done, s"connectedComponents did not converge in $maxIter rounds " +
      "(pathological chain graph — use a log-round decomposition at this scale)")
    edges.unpersist(blocking = false)
    labels.select(col("node"), col("label").as("component"))
  }

  /** Duplicate-group summary: one row per component with its canonical
    * survivor (min id) and size.
    */
  def dupGroups(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    connectedComponents(pairs, aCol, bCol)
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"))
      .select(col("component").as("keep_id"), col("n_members"))

  /** The end-to-end near-dup DROP: keep every row whose id is either
    * untouched by any pair or is its component's canonical survivor
    * (min id). Anti-join on the loser set — the loser table is
    * component-bounded (≤ pairs), usually tiny next to the corpus, so
    * Catalyst broadcasts it and the corpus never shuffles.
    */
  def dropNearDuplicates(
      corpus: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val losers = connectedComponents(pairs, aCol, bCol)
      .where(col("node") =!= col("component"))
      .select(col("node"))
    corpus.join(losers, corpus(idCol).cast("long") === losers("node"), "left_anti")
  }
}
