package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count-Min sketch aggregate:
  * `count_min(hash bigint, depth, widthBits)` → `array<long>` of
  * `depth · 2^widthBits` bucket counts (row-major) — the mergeable
  * frequency-estimation sketch (Cormode & Muthukrishnan 2005): item
  * frequency ≈ min over rows of its bucket count, an overestimate with
  * one-sided error ≤ e·N/w at probability 1 − e^−depth.
  *
  * Why it exists: exact per-item counts over 100 TB need a full
  * shuffle of every key; the sketch is a few KB per GROUP, merges
  * associatively across partitions/days (elementwise add through
  * partial/final ObjectHashAggregate), and answers point frequency
  * queries after one pass. The heavy-hitter prefilter of every
  * large-corpus token/URL/fingerprint frequency pipeline.
  *
  * Portability (the reason this is oracle-checkable, unlike engine
  * HLL/CMS built-ins): the `depth` row hashes are bit-SLICES of one
  * md5-derived 60-bit hash (`TextFunctions.hash60`) — row i's bucket is
  * `(hash >> (widthBits·i)) & (2^widthBits − 1)`. Pure bit ops both
  * engines compute identically; the DuckDB oracle rebuilds the exact
  * sketch with a GROUP BY over the same slices. Requires
  * `depth · widthBits ≤ 60`; md5's bit-uniformity makes the slices
  * pairwise-independent enough for the CMS bound in practice.
  *
  * Determinism: bucket counts are sums — associative and
  * order/partitioning-free. Null hashes are skipped; an empty group is
  * the zero sketch.
  */
case class CountMinAgg(
    hash: Expression,
    depth: Int,
    widthBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth >= 1 && widthBits >= 1,
    s"depth and widthBits must be positive, got $depth, $widthBits")
  require(widthBits <= 24,
    s"widthBits must be <= 24 (2^24 buckets = 128 MB per sketch row is " +
      s"already past any sane budget; larger shifts overflow Int), got $widthBits")
  require(depth * widthBits <= 60,
    s"depth * widthBits must be <= 60 (slices of one 60-bit hash), " +
      s"got $depth * $widthBits = ${depth * widthBits}")

  private val width = 1 << widthBits
  private val mask = width - 1

  override def child: Expression = hash

  override def checkInputDataTypes(): TypeCheckResult =
    hash.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint hash input, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_count_min"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val hv = hash.eval(input)
    if (hv != null) {
      val h = hv.asInstanceOf[Long]
      var i = 0
      while (i < depth) {
        buffer(i * width + ((h >>> (widthBits * i)).toInt & mask)) += 1
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(hash = newChild)
}
