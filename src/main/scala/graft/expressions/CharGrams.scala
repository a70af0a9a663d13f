package graft.expressions

import java.util.{LinkedHashSet => JLinkedHashSet}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused lowercase → distinct code-point n-gram kernel over raw text —
  * the [[graft.operators.LangId]] featurizer.
  *
  * Semantics are EXACTLY `array_distinct(filter(transform(sequence(1,
  * greatest(length(t) - (n-1), 0)), i -> substr(t, i, n)), g ->
  * length(g) = n)))` with `t = lower(text)`: every code-point n-gram
  * of the lowercased text, distinct in first-occurrence order
  * (CharGramsSpec pins the equivalence on multibyte/astral
  * adversarial strings).
  *
  * Why it exists: `substr(t, i, n)` on a UTF8String walks bytes from
  * the START to find code point i, so the lambda chain is O(len²)
  * byte-scanning per document — measured as the dominant cost of the
  * LID featurization (11.4 s of q217's 13.2 s score at sf0.1). This
  * kernel records code-point boundaries in ONE pass and slices grams
  * directly — O(len·n) — inside whole-stage codegen.
  */
case class CharGrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"gram width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got $t")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_grams"

  override def nullSafeEval(input: Any): Any =
    CharGrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CharGrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
}

object CharGrams {

  /** UTF-8 continuation byte: 10xxxxxx. */
  @inline private def isCont(b: Byte): Boolean = (b & 0xc0) == 0x80

  def compute(input: UTF8String, n: Int): GenericArrayData = {
    // EXACTLY the lowercase Spark's lower() applies under the default
    // session (UTF8_BINARY, spark.sql.icu.caseMappings.enabled=true →
    // ICU). NOT UTF8String.toLowerCase: the JDK lane disagrees with
    // ICU on a final sigma preceded by an astral-plane cased letter
    // (𝕐Σ → 𝕐σ vs ICU's 𝕐ς — the JDK's final-cased look-back trips on
    // the surrogate pair), which CharGramsSpec's adversarial mix
    // caught. Pinned to ICU regardless of the session conf — the
    // kernel is the featurizer's definition, and a conf-dependent
    // feature space would silently retrain models.
    val s = org.apache.spark.sql.catalyst.util.CollationSupport.Lower
      .exec(input, org.apache.spark.sql.catalyst.util.CollationFactory
        .UTF8_BINARY_COLLATION_ID, true)
    val bytes = s.getBytes
    val len = bytes.length
    // code-point start offsets (+ end sentinel), one linear pass
    val starts = new Array[Int](len + 1)
    var nCp = 0
    var i = 0
    while (i < len) {
      if (!isCont(bytes(i))) { starts(nCp) = i; nCp += 1 }
      i += 1
    }
    starts(nCp) = len
    if (nCp < n) return new GenericArrayData(Array.empty[Any])
    val seen = new JLinkedHashSet[UTF8String](math.min(64, nCp))
    var p = 0
    while (p + n <= nCp) {
      val from = starts(p)
      val to = starts(p + n)
      val g = new Array[Byte](to - from)
      System.arraycopy(bytes, from, g, 0, to - from)
      seen.add(UTF8String.fromBytes(g))
      p += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
