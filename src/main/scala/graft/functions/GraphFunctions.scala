package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge

/** Column wrappers for the packed-adjacency kernels (see
  * [[graft.expressions.PackedAdjacency]] for format and rationale).
  */
object GraphFunctions {

  /** Strictly ascending `array<bigint>` → delta-varint `binary`. */
  def packAdj(a: Column): Column =
    ColumnBridge.column(graft.expressions.PackSortedLongs(ColumnBridge.expression(a)))

  /** Intersection of two [[packAdj]] binaries → `array<bigint>`. */
  def packedIntersect(a: Column, b: Column): Column =
    ColumnBridge.column(graft.expressions.PackedIntersect(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Two-pointer intersection of two ASCENDING `array<bigint>`s. */
  def sortedIntersect(a: Column, b: Column): Column =
    ColumnBridge.column(graft.expressions.SortedIntersect(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
