package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003 —
  * the MOSS algorithm): polynomial rolling hashes of every `k`-codepoint
  * gram, then the DISTINCT minimum of each `w`-hash window, ascending.
  * The guarantee: any shared substring of length ≥ k + w − 1 between
  * two documents yields at least one shared fingerprint — substring-
  * level copy detection with sketch-sized output, where shingle hashing
  * (MinHash) only sees token-level similarity.
  *
  * Cross-engine portability: the hash is the plain left fold
  * `(acc·B + codepoint) mod P` over each gram, recomputed per gram —
  * exactly a SQL `list_reduce`, so DuckDB rebuilds identical
  * fingerprints (codepoints via `unicode(substr(s,i,1))`). The
  * constructor enforces the exact overflow-free bound
  * (mod−1)·base + maxCodepoint ≤ Long.MaxValue, so the fold can never
  * wrap (DuckDB would error on wrap — silent divergence is
  * impossible). Output is a VALUE set, so in-window tie position is
  * irrelevant.
  *
  * Null input → null; shorter than k codepoints → empty array.
  */
case class RollingWinnow(
    child: Expression, k: Int, w: Int,
    base: Long = 257L, mod: Long = 1000000007L)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"k and w must be positive, got $k, $w")
  // direct overflow-free condition on the fold's worst step:
  // (mod-1)·base + maxCodepoint must stay within Long
  require(base > 1 && mod > 1 &&
      (mod - 1) <= (Long.MaxValue - 0x10FFFF) / base,
    s"(mod-1)*base + maxCodepoint must fit a Long (overflow-free fold), " +
      s"got base=$base, mod=$mod")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any =
    RollingWinnow.compute(input.asInstanceOf[UTF8String], k, w, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = graft.expressions.RollingWinnow.compute($s, $k, $w, ${base}L, ${mod}L);"
    })

  override protected def withNewChildInternal(newChild: Expression): RollingWinnow =
    copy(child = newChild)
}

object RollingWinnow {

  /** Static kernel (called from generated code): codepoints → per-gram
    * fold hashes → per-window minima → distinct ascending.
    */
  def compute(s: UTF8String, k: Int, w: Int, base: Long, mod: Long): ArrayData = {
    val str = s.toString
    // code POINTS (not chars): DuckDB's substr/unicode are codepoint-
    // indexed, and the fold must see identical values on both engines
    val cps = str.codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val m = n - k + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = (acc * base + cps(i + j)) % mod; j += 1 }
      hs(i) = acc
      i += 1
    }
    val selected = new java.util.TreeSet[java.lang.Long]()
    if (m <= w) {
      var mn = hs(0); var t = 1
      while (t < m) { if (hs(t) < mn) mn = hs(t); t += 1 }
      selected.add(mn)
    } else {
      var j = 0
      while (j + w <= m) {
        var mn = hs(j); var t = j + 1
        while (t < j + w) { if (hs(t) < mn) mn = hs(t); t += 1 }
        selected.add(mn)
        j += 1
      }
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
