package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle enumeration over an undirected edge list — the graph kernel
  * beyond connected components (operators.Components): co-occurrence
  * triangles, cluster-coefficient inputs, spam/boilerplate ring
  * detection over near-dup graphs.
  *
  * Scale shape: edges are ORIENTED by (degree, id) before the wedge
  * join — every edge points from its lower-(degree, id) endpoint to the
  * higher one, so wedge fan-out per vertex is bounded by its
  * out-degree under that total order. This is the standard
  * O(m^1.5)-work formulation: a hub of degree d contributes ~d² wedges
  * under naive u<v orientation but only ~(its out-degree)² ≲ m/avg-deg
  * under degree orientation. The triangle SET is orientation-invariant,
  * which is what lets the DuckDB oracle verify this plan with the naive
  * formulation (q104).
  *
  * Each triangle (x, y, z) with (deg,id)(x) < (deg,id)(y) < (deg,id)(z)
  * appears exactly once: as wedge x→y→z closed by edge x→z.
  */
object Triangles {

  /** Canonical distinct undirected edges (u < v), self-loops dropped. */
  def canonicalEdges(df: DataFrame, aCol: String, bCol: String): DataFrame =
    df.select(least(col(aCol), col(bCol)).as("u"), greatest(col(aCol), col(bCol)).as("v"))
      .where(col("u") < col("v"))
      .distinct()

  /** One row per triangle: (a, b, c) in (degree, id) order. */
  def triangles(edges: DataFrame): DataFrame = {
    val e = edges.select(col("u"), col("v"))
    val deg = e.select(col("u").as("x")).unionAll(e.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    // orient: src = lower (degree, id) endpoint. Join degrees on both
    // endpoints (deg is |V| rows — shuffles, never collected).
    val du = deg.select(col("x").as("u"), col("d").as("du"))
    val dv = deg.select(col("x").as("v"), col("d").as("dv"))
    val o = e.join(du, "u").join(dv, "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("src"),
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("v")).otherwise(col("u")).as("dst"))
    // wedge src→m→dst closed by src→dst
    val e1 = o.select(col("src").as("a"), col("dst").as("b"))
    val e2 = o.select(col("src").as("b"), col("dst").as("c"))
    val e3 = o.select(col("src").as("a"), col("dst").as("c"))
    e1.join(e2, "b").join(e3, Seq("a", "c"), "leftsemi")
      .select(col("a"), col("b"), col("c"))
  }

  /** Per-vertex triangle participation counts. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val t = triangles(edges)
    t.select(explode(array(col("a"), col("b"), col("c"))).as("vertex"))
      .groupBy("vertex").agg(count(lit(1)).as("n_triangles"))
  }
}
