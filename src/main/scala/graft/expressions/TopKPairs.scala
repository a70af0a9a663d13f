package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: `top_k((score double, id bigint), k)` →
  * `array<struct<score, id>>` ordered best-first (score desc, id asc).
  *
  * This is the scale-path alternative to the `row_number() OVER (...)
  * <= k` window idiom: a window top-k shuffles EVERY row of a group to
  * one partition and sorts it, so a 100 TB group costs a 100 TB
  * shuffle. This aggregate runs as partial + final `ObjectHashAggregate`
  * — each map task keeps at most k candidates per group in a bounded
  * heap, so only `k × groups × partitions` rows cross the wire, and
  * nothing is ever globally sorted.
  *
  * Determinism: ids are assumed unique within a group, giving (score,
  * id) a total order, so heap-eviction order cannot affect the result —
  * the output is the same set a window formulation produces (verified
  * against the DuckDB window oracle bit-for-bit in q50).
  *
  * Null handling matches SQL aggregates: rows with a null score or null
  * id are skipped. An empty group yields an empty array.
  *
  * `dedup = true` additionally skips EXACT (score, id) repeats — for
  * inputs where the same logical pair can arrive several times with a
  * deterministic, hence bit-identical, score (an LSH candidate that
  * collides in several tables). Each buffer then holds a SET, so a
  * repeat can never occupy two of the k slots, and the upstream
  * `distinct()` (a full shuffle of the candidate set) can be dropped.
  * Scores compare by `doubleToLongBits` (all NaNs collapse to one
  * pattern, matching `better`'s NaN total order); the containment scan
  * is O(k) per insert with k small by contract. Ids that repeat with
  * DIFFERENT scores are still kept distinct — callers wanting
  * per-neighbor dedup must guarantee score determinism, which every
  * LSH family kernel here does.
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    dedup: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with BinaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  override def left: Expression = score
  override def right: Expression = id

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint) inputs, got ($s, $i)")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k"

  // "Better" under SQL `ORDER BY score DESC, id ASC` semantics: NaN
  // sorts as the LARGEST double (so it ranks first, as a window would
  // rank it), and -0.0 == 0.0 (primitive ==) so ±0.0 ties break on id —
  // a JVM Ordering[Double] would get both wrong and silently diverge
  // from the window formulation this aggregate must match.
  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val n1 = java.lang.Double.isNaN(s1)
    val n2 = java.lang.Double.isNaN(s2)
    if (n1 && n2) i1 < i2 // equal-NaN scores tiebreak on id, like the window
    else if (n1) true
    else if (n2) false
    else if (s1 == s2) i1 < i2
    else s1 > s2
  }

  // Heap order: head is the WORST kept pair, so exceeding k pops the
  // right element (scala PriorityQueue is a max-heap; "greater" = worse).
  private val evictionOrder: Ordering[(Double, Long)] =
    (x: (Double, Long), y: (Double, Long)) =>
      if (better(x._1, x._2, y._1, y._2)) -1
      else if (better(y._1, y._2, x._1, x._2)) 1
      else 0

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(evictionOrder)

  override def update(
      buffer: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val sv = score.eval(input)
    val iv = id.eval(input)
    if (sv != null && iv != null) {
      add(buffer, (sv.asInstanceOf[Double], iv.asInstanceOf[Long]))
    }
    buffer
  }

  private def add(
      buffer: mutable.PriorityQueue[(Double, Long)],
      pair: (Double, Long)): Unit = {
    // O(1) fast path FIRST: with a full buffer, a pair not strictly
    // better than the current worst is rejected outright — correct in
    // dedup mode too (an in-buffer duplicate would compare equal or
    // better, never strictly worse, so a rejected pair either isn't a
    // duplicate or would have been skipped anyway). The O(k) dedup
    // containment scan then runs only for pairs that would actually
    // enter the buffer — at brute-force |Q|·|C| input rates the scan
    // on every row would multiply the rank cost by k.
    if (buffer.size >= k && evictionOrder.compare(pair, buffer.head) >= 0) return
    if (dedup && buffer.exists(p => p._2 == pair._2 &&
        java.lang.Double.doubleToLongBits(p._1) ==
          java.lang.Double.doubleToLongBits(pair._1))) return
    if (buffer.size >= k) buffer.dequeue()
    buffer.enqueue(pair)
  }

  override def merge(
      buffer: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(add(buffer, _))
    buffer
  }

  override def eval(buffer: mutable.PriorityQueue[(Double, Long)]): Any = {
    val best = buffer.toArray.sorted(evictionOrder)
    new GenericArrayData(best.map { case (s, i) =>
      InternalRow(s, i): Any
    })
  }

  override def serialize(buffer: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    buffer.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairs =
    copy(score = newLeft, id = newRight)
}
