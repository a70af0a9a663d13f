package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact interpolated percentiles by VALUE BUFFERING: append every
  * non-null double to a growable primitive array (8 bytes/value),
  * merge partials by array concat, sort once at eval, read the
  * interpolation anchors off the sorted array.
  *
  * Why not Spark's `percentile`: its buffer is a value→count
  * OpenHashMap — ~50 bytes and a hash probe per distinct value, and
  * the final merge deserializes and UNIONS maps the size of the data
  * when values are near-distinct (prices, latencies). Measured on the
  * 498-group × 6M-row q155 profile at sf1: `percentile` 8.5 s, the
  * sort-path window 6.1 s, THIS aggregate ~2 s — the buffer is the
  * data itself at 8 bytes/value, merge is arraycopy, and the one
  * O(n log n) sort per group happens on a primitive array in the
  * final task (the quickselect engines run the same play).
  *
  * Interpolation is bit-identical to Spark's `Percentile.getPercentile`
  * (position `(n−1)·p`; `lo·(⌈pos⌉−pos) + hi·(pos−⌊pos⌋)` between
  * anchors), so DuckDB `quantile_cont` oracles transfer unchanged.
  *
  * Output: struct(n: long, pct: array<double>) — count of non-null
  * values and one interpolated percentile per requested percentage;
  * a group with no non-null values yields (0, null), matching the
  * built-in aggregate's shape.
  *
  * Scale bound: the per-group buffer is the group's values — exact
  * percentiles ARE the data. For groups that won't fit an executor
  * (near-keyless profiles at 100 TB) use `percentile_approx`, the
  * mergeable-sketch path this exact kernel anchors (q150 pairs them).
  *
  * NaN note: NaNs sort last (java.util.Arrays.sort), the same terminal
  * position Spark's interpreted double ordering gives them.
  */
case class ExactPercentiles(
    child: Expression,
    percentages: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ExactPercentiles.Buf] with UnaryLike[Expression] {

  require(percentages.nonEmpty, "exact_percentiles needs at least one percentage")
  require(percentages.forall(p => p >= 0.0 && p <= 1.0),
    s"percentages outside [0,1]: $percentages")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires double input (cast first), got $t")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("pct", ArrayType(DoubleType, containsNull = false), nullable = true)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_exact_percentiles"

  override def createAggregationBuffer(): ExactPercentiles.Buf =
    new ExactPercentiles.Buf(new Array[Double](16), 0)

  override def update(buf: ExactPercentiles.Buf, input: InternalRow): ExactPercentiles.Buf = {
    val v = child.eval(input)
    if (v != null) buf.append(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: ExactPercentiles.Buf, other: ExactPercentiles.Buf): ExactPercentiles.Buf = {
    buf.appendAll(other)
    buf
  }

  override def eval(buf: ExactPercentiles.Buf): Any = {
    if (buf.n == 0) return new GenericInternalRow(Array[Any](0L, null))
    val sorted = java.util.Arrays.copyOf(buf.arr, buf.n)
    java.util.Arrays.sort(sorted)
    val out = new Array[Any](percentages.length)
    var i = 0
    while (i < percentages.length) {
      // Spark Percentile.getPercentile's exact double expression
      val position = (buf.n - 1).toDouble * percentages(i)
      val lower = math.floor(position).toInt
      val higher = math.ceil(position).toInt
      out(i) =
        if (lower == higher) sorted(lower)
        else sorted(lower) * (higher - position) + sorted(higher) * (position - lower)
      i += 1
    }
    new GenericInternalRow(Array[Any](buf.n.toLong, new GenericArrayData(out)))
  }

  override def serialize(buf: ExactPercentiles.Buf): Array[Byte] = {
    // long arithmetic + loud bound: at ~268M values per group the Int
    // size expression would wrap and die as a cryptic ByteBuffer error
    val bytes = 4L + buf.n.toLong * 8L
    require(bytes <= Int.MaxValue - 8,
      s"$prettyName: a single group buffered ${buf.n} values (${bytes / (1 << 20)} MB) — " +
        "exact percentiles buffer the group's data; use percentile_approx at this scale")
    val bb = ByteBuffer.allocate(bytes.toInt)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ExactPercentiles.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val arr = new Array[Double](math.max(n, 16))
    var i = 0
    while (i < n) { arr(i) = bb.getDouble; i += 1 }
    new ExactPercentiles.Buf(arr, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactPercentiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactPercentiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ExactPercentiles =
    copy(child = newChild)
}

object ExactPercentiles {
  /** Growable primitive double buffer — the aggregation state. */
  final class Buf(var arr: Array[Double], var n: Int) {
    def append(v: Double): Unit = {
      if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
      arr(n) = v
      n += 1
    }
    def appendAll(other: Buf): Unit = {
      val need = n + other.n
      if (need > arr.length)
        arr = java.util.Arrays.copyOf(arr, math.max(need, arr.length * 2))
      System.arraycopy(other.arr, 0, arr, n, other.n)
      n = need
    }
  }
}
