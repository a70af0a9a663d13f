package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Delta-varint packing for sorted long adjacency lists — the triangle
  * kernel's shuffle-payload reduction (round-11 verdict #2: at sf10
  * the fallback attach shipped the source adjacency as a raw
  * `array<long>` per exploded edge row — 8 B + overhead per entry,
  * ~120 GB of exchange; sorted deltas varint-encode to ~2-3 B per
  * entry on id-spread graphs and strictly less on clustered ids).
  *
  * Format: first element zigzag-varint (any sign), then strictly
  * positive gaps as plain varints. Both expressions are codegen'd
  * calls into the static kernels below — the intersection never
  * materializes the decoded arrays, it two-pointer-merges the two
  * varint streams directly.
  */
object PackedAdjacency {

  private def writeVarint(out: Array[Byte], pos0: Int, v0: Long): Int = {
    var v = v0; var pos = pos0
    while ((v & ~0x7fL) != 0L) { out(pos) = ((v & 0x7f) | 0x80).toByte; pos += 1; v >>>= 7 }
    out(pos) = v.toByte
    pos + 1
  }

  /** Pack a STRICTLY ASCENDING long array (fail-loud otherwise — the
    * caller owns the sort_array + array_distinct).
    */
  def pack(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    if (n == 0) return Array.emptyByteArray
    val out = new Array[Byte](n * 10)
    var prev = arr.getLong(0)
    var pos = writeVarint(out, 0, (prev << 1) ^ (prev >> 63)) // zigzag first
    var i = 1
    while (i < n) {
      val v = arr.getLong(i)
      val gap = v - prev
      if (gap <= 0L)
        throw new IllegalArgumentException(
          s"graft_pack_adj requires a strictly ascending array (${prev} then ${v})")
      pos = writeVarint(out, pos, gap)
      prev = v
      i += 1
    }
    java.util.Arrays.copyOfRange(out, 0, pos)
  }

  /** Sequential varint reader over a packed stream. Two short-lived
    * instances per intersect call — escape-analysis fodder; the win
    * over decoding whole arrays is never materializing hub-sized
    * neighbor lists.
    */
  private final class Cursor(buf: Array[Byte]) {
    private var pos = 0
    var v = 0L
    private def readRaw(): Long = {
      var shift = 0; var acc = 0L; var more = true
      while (more) {
        val x = buf(pos); pos += 1
        acc |= (x & 0x7fL) << shift; shift += 7; more = (x & 0x80) != 0
      }
      acc
    }
    def readFirst(): Unit = { val z = readRaw(); v = (z >>> 1) ^ -(z & 1L) }
    def advance(): Boolean =
      if (pos >= buf.length) false else { v += readRaw(); true }
  }

  /** Sorted-merge intersection of two packed streams → long[] (the
    * triangle candidates c ∈ N(a) ∩ N(b)). O(|a| + |b|) decodes, no
    * allocation beyond the result.
    */
  def intersect(a: Array[Byte], b: Array[Byte]): Array[Long] = {
    if (a.length == 0 || b.length == 0) return Array.emptyLongArray
    val ca = new Cursor(a); ca.readFirst()
    val cb = new Cursor(b); cb.readFirst()
    var out = new Array[Long](8)
    var n = 0
    var done = false
    while (!done) {
      if (ca.v == cb.v) {
        if (n == out.length) out = java.util.Arrays.copyOf(out, n * 2)
        out(n) = ca.v; n += 1
        done = !ca.advance() || !cb.advance()
      } else if (ca.v < cb.v) done = !ca.advance()
      else done = !cb.advance()
    }
    if (n == 0) Array.emptyLongArray else java.util.Arrays.copyOfRange(out, 0, n)
  }
}

/** `array<long>` (strictly ascending) → packed binary. */
case class PackSortedLongs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $t")
  }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_pack_adj"

  override def nullSafeEval(a: Any): Any =
    PackedAdjacency.pack(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x =>
      s"graft.expressions.PackedAdjacency.pack($x)")

  override protected def withNewChildInternal(newChild: Expression): PackSortedLongs =
    copy(child = newChild)
}

/** Two-pointer intersection of two SORTED `array<long>` columns →
  * `array<long>` — the fallback triangle lane's CPU kernel. Beats
  * `array_intersect` (which builds a hash set per row) AND the varint
  * lane's per-entry decode when the shuffle stays in page cache
  * (measured at sf10, warm, 120 M edge rows: arrays+hashset ~55-64 s,
  * packed varint ~116-121 s — see BASELINE.md round-12). Inputs MUST
  * be ascending (the caller owns `array_sort`); duplicates within one
  * input emit once per matching pair on the other side — adjacency
  * rows are distinct by construction, so never hit here.
  */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got $l and $r")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sorted_intersect"

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayData.toArrayData(SortedIntersect.merge(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"graft.expressions.SortedIntersect.merge($x, $y))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersect =
    copy(left = newLeft, right = newRight)
}

object SortedIntersect {
  def merge(a: ArrayData, b: ArrayData): Array[Long] = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 || nb == 0) return Array.emptyLongArray
    var out = new Array[Long](8)
    var n = 0
    var i = 0; var j = 0
    var va = a.getLong(0); var vb = b.getLong(0)
    var done = false
    while (!done) {
      if (va == vb) {
        if (n == out.length) out = java.util.Arrays.copyOf(out, n * 2)
        out(n) = va; n += 1
        i += 1; j += 1
        if (i < na && j < nb) { va = a.getLong(i); vb = b.getLong(j) } else done = true
      } else if (va < vb) {
        i += 1
        if (i < na) va = a.getLong(i) else done = true
      } else {
        j += 1
        if (j < nb) vb = b.getLong(j) else done = true
      }
    }
    if (n == 0) Array.emptyLongArray else java.util.Arrays.copyOfRange(out, 0, n)
  }
}

/** Intersection of two packed adjacency binaries → `array<long>`. */
case class PackedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two binary inputs, got $l and $r")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_packed_intersect"

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayData.toArrayData(PackedAdjacency.intersect(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"graft.expressions.PackedAdjacency.intersect($x, $y))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PackedIntersect =
    copy(left = newLeft, right = newRight)
}
