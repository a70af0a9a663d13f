package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition (fixed k): the maximal subgraph in which every
  * vertex has degree ≥ k, found by iteratively peeling vertices of
  * degree < k until a fixed point. The classic graph-quality filter —
  * link-spam pruning, dense-community extraction, "well-connected
  * entity" selection — and, like PageRank/Components, a loop the
  * declarative layer cannot express in one plan.
  *
  * Scale shape per round: one groupBy(src) degree count over the
  * surviving arc set + two anti joins against the peeled set, with
  * lineage TRUNCATED each round (the [[Components]] precedent:
  * localCheckpoint materializes the round; rebuilding from the RDD
  * resets the inherited stats that otherwise grow geometrically
  * through self-joins). Rounds are bounded by the peeling depth —
  * O(longest degeneracy chain), typically < 10 on real graphs — not by
  * graph size; each round's shuffle shrinks with the surviving set.
  *
  * Cites the peeling algorithm of Matula-Beck (1983) as described in
  * public literature; no reference-engine counterpart (the reference
  * pipeline has no graph surface — this extends SURVEY §2's
  * LLM-pipeline additions).
  */
object KCore {

  /** Vertices of the k-core of the undirected graph given as `pairs`
    * (any orientation, duplicates fine — canonicalized and deduped
    * internally; self-loops dropped). Returns (vertex, core_degree):
    * the surviving vertices with their degree INSIDE the core
    * (≥ k by construction). Empty result when no k-core exists.
    */
  def core(
      pairs: DataFrame, aCol: String, bCol: String, k: Int,
      maxIter: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val e0 = pairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()

    def truncated(df: DataFrame): DataFrame =
      df.sparkSession.createDataFrame(df.rdd, df.schema)

    var arcs = truncated(
      e0.union(e0.select(col("v").as("u"), col("u").as("v")))
        .localCheckpoint(true))

    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // materialize the peel set ONCE: it feeds the emptiness probe and
      // BOTH anti-join sides — un-materialized, self-join dedup clones
      // the subtree and the degree aggregation would run three times
      // per round
      val bad = truncated(
        arcs.groupBy(col("u")).agg(count(lit(1)).as("deg"))
          .where(col("deg") < k).select(col("u").as("peel"))
          .localCheckpoint(true))
      if (bad.limit(1).count() == 0) done = true
      else {
        arcs = truncated(arcs
          .join(bad, arcs("u") === bad("peel"), "left_anti")
          .join(bad.select(col("peel").as("peel_v")),
            arcs("v") === col("peel_v"), "left_anti")
          .localCheckpoint(true))
        iter += 1
      }
    }
    require(done, s"k-core peeling did not converge in $maxIter rounds")
    arcs.groupBy(col("u")).agg(count(lit(1)).as("core_degree"))
      .select(col("u").as("vertex"), col("core_degree"))
  }
}
