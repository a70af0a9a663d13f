package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) via the JDK's
  * `java.text.Normalizer` — the canonicalization step every
  * fingerprint/dedup/join on user-generated text needs: visually
  * identical strings with different codepoint sequences ("é" composed
  * vs "e"+U+0301) must hash identically BEFORE md5/minhash sees them,
  * or near-duplicates silently survive. Spark has no builtin for this;
  * DuckDB exposes `nfc_normalize`, which the oracle uses.
  *
  * Accent stripping composes as NFD + `regexp_replace('\p{Mn}', '')`
  * (see `TextFunctions.stripAccents`) ≡ DuckDB's `strip_accents`.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"form must be one of NFC/NFD/NFKC/NFKD, got $form")

  @transient private lazy val normForm = Normalizer.Form.valueOf(form)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $t")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = s"graft_normalize_${form.toLowerCase}"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      Normalizer.normalize(input.asInstanceOf[UTF8String].toString, normForm))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($s.toString(),
         |    java.text.Normalizer.Form.$form));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}
