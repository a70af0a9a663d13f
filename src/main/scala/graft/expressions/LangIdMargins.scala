package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused [[graft.operators.LangId]]/-style scoring kernel: text → the K
  * per-class margins of a hashed-char-n-gram presence linear model, in
  * ONE codegen pass per row.
  *
  * Semantics are EXACTLY the in-row decimal fold it replaces
  * (LangId.score r15 formulation, kept as `scoreViaMarginFold` for the
  * spec pin):
  *
  *   buckets = concat(array_distinct(transform(
  *       graft_char_grams(text, n), g -> pmod(hash60(g), nBuckets))),
  *     array(nBuckets))                     -- the intercept row
  *   m_c = cast(aggregate(buckets, 0.0 as decimal,
  *       (acc, b) -> acc + cast(W[b][c] as decimal(38,18))) as double)
  *
  * bit-for-bit, because every piece is replicated rather than
  * approximated:
  *  - grams come from [[CharGrams.compute]] itself (the pinned ICU
  *    lowercase + distinct code-point grams kernel);
  *  - hash60 ≡ `conv(substring(md5(g),1,15),16,10)`: the first 60 bits
  *    of the md5 digest as a non-negative long (15 hex digits);
  *  - each weight term is rounded double→decimal(38,18) exactly as
  *    Spark's cast (`BigDecimal.valueOf` — the canonical-string
  *    conversion — then HALF_UP to scale 18), the per-class sum is an
  *    exact decimal add (order-free, so bucket iteration order is
  *    irrelevant), and the final double is `BigDecimal.doubleValue`,
  *    which is what Spark's decimal→double cast runs.
  *
  * Why it exists (guide §1.2 "per-task work" / §4 "prefer codegen"):
  * the fold formulation is K separate `aggregate()` higher-order
  * lambdas — interpreted, each re-evaluating the gram/hash/distinct
  * subtree and allocating per element — measured ~3.0 s per corpus
  * pass at sf0.1 (LidScoreProfile) and the dominant cost of
  * q217/q218/q220. This kernel hashes each distinct gram once,
  * dedupes buckets in a boolean array, and folds all K margins in one
  * tight loop — no Catalyst lambda machinery, no intermediate arrays.
  *
  * Null semantics: null text → null margins (callers wrap the input in
  * `coalesce(text, '')`, matching the fold formulation).
  */
case class LangIdMargins(
    child: Expression, n: Int, nBuckets: Int, weights: Array[Array[Double]])
    extends UnaryExpression {

  require(n >= 1, s"gram width must be >= 1, got $n")
  require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
  require(weights.length == nBuckets + 1,
    s"weight matrix must have nBuckets+1=${nBuckets + 1} rows, got ${weights.length}")
  private val k = weights.head.length
  require(weights.forall(_.length == k), "ragged weight matrix")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got $t")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_langid_margins"

  /** dec18-rounded weight rows, built once per (deserialized) instance —
    * the same double→decimal(38,18) rounding as Spark's cast.
    */
  @transient private lazy val decW: Array[Array[java.math.BigDecimal]] =
    weights.map(_.map(LangIdMargins.dec18))

  def compute(input: UTF8String): GenericArrayData = {
    val grams = CharGrams.compute(input, n)
    val seen = new Array[Boolean](nBuckets)
    val acc = new Array[java.math.BigDecimal](k)
    // the intercept bucket (b = nBuckets) is always present
    var c = 0
    while (c < k) { acc(c) = decW(nBuckets)(c); c += 1 }
    val md = LangIdMargins.md5.get()
    var i = 0
    while (i < grams.numElements()) {
      val g = grams.getUTF8String(i)
      md.reset()
      val d = md.digest(g.getBytes)
      // first 60 bits of the digest = conv(substring(md5_hex,1,15),16,10)
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      v = (v << 4) | ((d(7) & 0xffL) >>> 4)
      val b = (v % nBuckets).toInt
      if (!seen(b)) {
        seen(b) = true
        val row = decW(b)
        c = 0
        while (c < k) { acc(c) = acc(c).add(row(c)); c += 1 }
      }
      i += 1
    }
    val out = new Array[Double](k)
    c = 0
    while (c < k) { out(c) = acc(c).doubleValue; c += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdMargins", this,
      classOf[LangIdMargins].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdMargins =
    copy(child = newChild)
}

object LangIdMargins {

  /** Spark's double→decimal(38,18) cast, exactly (see LangId.dec18). */
  private[graft] def dec18(v: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(v).setScale(18, java.math.RoundingMode.HALF_UP)

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
}
