package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sketch builders/probes that pair with the typed aggregates in
  * `graft.expressions`. Hashing stays OUTSIDE the aggregates
  * (TextFunctions.hash60) so a SQL oracle can mirror it symmetrically —
  * the property that makes these approximate operators hash-checkable
  * cross-engine, unlike engine-private HLL/CMS built-ins.
  */
object Sketches {

  /** Count-Min sketch aggregate over a 60-bit portable hash: array of
    * `depth · 2^widthBits` bucket counts (see expressions.CountMinAgg).
    */
  def countMin(hash: Column, depth: Int, widthBits: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.CountMinAgg(
        org.apache.spark.sql.graft.ColumnBridge.expression(hash),
        depth, widthBits).toAggregateExpression())

  /** Point-frequency estimate from a [[countMin]] sketch: min over the
    * depth rows of the probed item's bucket count. Pure builtins
    * (least over element_at), so the probe rides whole-stage codegen
    * and the oracle replicates it with list indexing.
    */
  def countMinEstimate(sketch: Column, hash: Column, depth: Int, widthBits: Int): Column = {
    val width = 1 << widthBits
    least((0 until depth).map { i =>
      element_at(sketch,
        (lit(i * width) + (shiftrightunsigned(hash, widthBits * i)
          .bitwiseAND(lit(width - 1))).cast("int") + 1).cast("int"))
    }: _*)
  }

  /** Bloom filter aggregate over a 60-bit portable hash: bitset words
    * (see expressions.BloomAgg).
    */
  def bloom(hash: Column, numHashes: Int, bitsLog2: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.BloomAgg(
        org.apache.spark.sql.graft.ColumnBridge.expression(hash),
        numHashes, bitsLog2).toAggregateExpression())

  // variable-amount unsigned shift (the DSL overload only takes a
  // literal shift); the expression itself is codegen'd builtin
  private def ushr(v: Column, n: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.ShiftRightUnsigned(
        org.apache.spark.sql.graft.ColumnBridge.expression(v),
        org.apache.spark.sql.graft.ColumnBridge.expression(n)))

  /** Membership probe against a [[bloom]] filter: true iff every one of
    * the `numHashes` probed bits is set. Pure builtins — the scale
    * pattern is `bigSide.where(bloomMightContain(...))` with the words
    * array broadcast, prefiltering before an exact join.
    */
  def bloomMightContain(
      words: Column, hash: Column, numHashes: Int, bitsLog2: Int): Column =
    (0 until numHashes).map { i =>
      val pos = shiftrightunsigned(hash, bitsLog2 * i)
        .bitwiseAND(lit((1L << bitsLog2) - 1))
      val word = element_at(words, (shiftrightunsigned(pos, 6) + 1).cast("int"))
      ushr(word, pos.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
}
