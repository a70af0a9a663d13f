package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bloom filter aggregate:
  * `bloom(hash bigint, numHashes, bitsLog2)` → `array<long>` of
  * `2^bitsLog2 / 64` bitset words. Membership: all `numHashes` probed
  * bits set — no false negatives, false-positive rate
  * ≈ (1 − e^(−k·n/m))^k.
  *
  * The broadcast-membership workhorse: a 100 TB anti-join against a
  * billion-key reference set needs the reference shuffled or broadcast
  * at full width; its Bloom filter is a few MB, broadcasts anywhere,
  * and prefilters the big side down to the candidates that need the
  * exact join. (Spark's own runtime bloom-pushdown exists for joins the
  * planner sees; this one is a first-class VALUE — buildable once,
  * storable, mergeable across days, probeable in any later query.)
  *
  * Portability: like CountMinAgg, the k probe positions are bit-slices
  * of one md5-derived 60-bit hash (`TextFunctions.hash60`) — position i
  * is `(hash >> (bitsLog2·i)) & (2^bitsLog2 − 1)`, so a SQL oracle
  * reproduces the exact bitset (DISTINCT positions) and the exact
  * membership answers, false positives included. Requires
  * `numHashes · bitsLog2 ≤ 60`.
  *
  * Merging is bitwise OR — associative, partitioning-free. Null hashes
  * are skipped; an empty group is the empty filter (nothing matches).
  */
case class BloomAgg(
    hash: Expression,
    numHashes: Int,
    bitsLog2: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(numHashes >= 1 && bitsLog2 >= 6,
    s"need numHashes >= 1 and bitsLog2 >= 6, got $numHashes, $bitsLog2")
  require(bitsLog2 <= 30,
    s"bitsLog2 must be <= 30 (2^30 bits = 128 MB filter is already past " +
      s"any sane budget; larger shifts overflow Int), got $bitsLog2")
  require(numHashes * bitsLog2 <= 60,
    s"numHashes * bitsLog2 must be <= 60 (slices of one 60-bit hash), " +
      s"got $numHashes * $bitsLog2 = ${numHashes * bitsLog2}")

  private val posMask = (1L << bitsLog2) - 1
  private val nWords = 1 << (bitsLog2 - 6)

  override def child: Expression = hash

  override def checkInputDataTypes(): TypeCheckResult =
    hash.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint hash input, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nWords)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val hv = hash.eval(input)
    if (hv != null) {
      val h = hv.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val pos = (h >>> (bitsLog2 * i)) & posMask
        buffer((pos >>> 6).toInt) |= 1L << (pos & 63)
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(hash = newChild)
}
