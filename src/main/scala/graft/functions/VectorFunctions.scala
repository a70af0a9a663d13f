package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as pure Catalyst
  * higher-order functions (no UDFs — stays in codegen).
  *
  * Cross-engine determinism: every reduction is an explicit sequential
  * left fold over doubles (`aggregate(..., 0d, +)`), which matches
  * DuckDB's `list_reduce` fold exactly, so even raw cosine values
  * hash-match the oracle bit-for-bit. Floats are cast to double BEFORE
  * multiplication (float·float would round differently).
  */
object VectorFunctions {

  /** array<float> → array<double> (exact widening). */
  def vecD(c: Column): Column = transform(c, _.cast("double"))

  /** Sequential-fold dot product of two double arrays, compiled to a
    * tight primitive loop by the custom codegen expression (identical
    * fold semantics to `aggregate(zip_with(a,b,_*_), 0d, +)`, ~40×
    * faster on pair-heavy workloads).
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.ArrayDotProduct(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Unit-normalized copy of a double vector (fused custom expression:
    * one norm computation per row — CollapseProject can't inline it
    * into per-element work; downstream cosine becomes a single dot).
    */
  def normalized(a: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.NormalizeVector(
        org.apache.spark.sql.graft.ColumnBridge.expression(a)))

  def normL2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (normL2(a) * normL2(b))

  /** Element-wise vector-sum AGGREGATE (one `double[dims]` accumulator
    * per group; partial+final ObjectHashAggregate — see VectorSumAgg).
    */
  def vecSum(v: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.VectorSumAgg(
        org.apache.spark.sql.graft.ColumnBridge.expression(v)).toAggregateExpression())

  /** Bounded-heap top-k AGGREGATE over (score, id) pairs, best-first
    * (score desc, id asc) — the map-side-combine alternative to a
    * `row_number() OVER` window top-k (see TopKPairs).
    */
  def topK(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.TopKPairs(
        org.apache.spark.sql.graft.ColumnBridge.expression(score),
        org.apache.spark.sql.graft.ColumnBridge.expression(id),
        k).toAggregateExpression())

  /** [[topK]] that also skips exact (score, id) repeats in-buffer —
    * for deterministic-score candidate streams where the same pair
    * arrives once per colliding LSH table, replacing an upstream
    * `distinct()` shuffle (see TopKPairs `dedup`).
    */
  def topKDistinct(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.TopKPairs(
        org.apache.spark.sql.graft.ColumnBridge.expression(score),
        org.apache.spark.sql.graft.ColumnBridge.expression(id),
        k, dedup = true).toAggregateExpression())

  /** KMV bottom-k distinct sketch AGGREGATE over a 60-bit portable hash
    * (TextFunctions.hash60) — the oracle-checkable approximate distinct
    * count (see KmvDistinct for the estimator and why HLL can't match).
    */
  def kmvDistinct(hash: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.KmvDistinct(
        org.apache.spark.sql.graft.ColumnBridge.expression(hash),
        k).toAggregateExpression())
}
