package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch:
  * `kmv_distinct(hash bigint, k)` → double estimate.
  *
  * The classic bottom-k estimator (Bar-Yossef et al. 2002): keep the k
  * smallest DISTINCT hash values; if fewer than k were seen the count
  * is exact, otherwise distinct ≈ (k-1) / h_k where h_k is the k-th
  * smallest hash normalized to [0,1). Standard error ≈ 1/sqrt(k-2).
  *
  * Why this exists next to `approx_count_distinct`: Spark's HLL++ and
  * DuckDB's HLL use engine-private hash functions, so their estimates
  * can never be compared across engines — the driver's oracle gate has
  * to fall back to a weak rows-only check (round-1 q24). KMV over an
  * md5-derived hash is ENGINE-PORTABLE: both engines compute the same
  * hash, so the estimate matches bit-for-bit and approximate distinct
  * counting becomes oracle-checkable like any exact query. At cluster
  * scale the sketch is also mergeable (bounded k-element buffers
  * through partial/final ObjectHashAggregate, like HLL), and sketches
  * from different partitions/days can be unioned without rescanning.
  *
  * Input contract: a 60-bit non-negative hash, uniform on [0, 2^60) —
  * produce it with `graft.functions.TextFunctions.hash60` (first 15 hex
  * chars of md5, the same construction MinHashSig uses); the oracle
  * replicates it with `CAST(concat('0x', substr(md5(x),1,15)) AS
  * BIGINT)`. Hashing lives OUTSIDE the aggregate so the SQL oracle can
  * mirror it symmetrically.
  *
  * Determinism: the k-th smallest of a distinct set is order-free;
  * 60-bit-int → double conversion and the final division are identical
  * IEEE operations in both engines.
  *
  * Null hashes are skipped (SQL aggregate semantics); an empty group
  * estimates 0.0.
  */
case class KmvDistinct(
    hash: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"k must be >= 2, got $k")

  override def child: Expression = hash

  override def checkInputDataTypes(): TypeCheckResult =
    hash.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint hash input, got $t")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_distinct"

  private val twoPow60 = math.pow(2.0, 60)

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def add(buffer: mutable.TreeSet[Long], h: Long): Unit = {
    if (buffer.size < k) buffer.add(h)
    else if (h < buffer.last && !buffer.contains(h)) {
      buffer.remove(buffer.last)
      buffer.add(h)
    }
  }

  override def update(
      buffer: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val hv = hash.eval(input)
    if (hv != null) add(buffer, hv.asInstanceOf[Long])
    buffer
  }

  override def merge(
      buffer: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(add(buffer, _))
    buffer
  }

  override def eval(buffer: mutable.TreeSet[Long]): Any =
    if (buffer.size < k) buffer.size.toDouble
    else (k - 1).toDouble / (buffer.last.toDouble / twoPow60)

  override def serialize(buffer: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 8)
    bb.putInt(buffer.size)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(hash = newChild)
}
