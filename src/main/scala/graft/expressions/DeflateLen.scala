package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compressed (raw DEFLATE, level fixed) byte length of a string — the
  * compression-ratio quality proxy of the Gopher/C4 filtering family:
  * highly compressible text (boilerplate, keyboard mash, template spam)
  * and fully incompressible text (base64 blobs, minified bundles) are
  * both low-value training data, and `deflate_len / byte_len` separates
  * them from natural prose with no model and no vocabulary.
  *
  * CodegenFallback is deliberate (the Multimodal-decoder precedent, not
  * the SQL-lambda anti-pattern): the work IS a JVM zlib call per row —
  * there is no expression tree to fuse, and a generated wrapper would
  * just re-emit the same call. The Deflater is allocated per evaluation
  * (they are not thread-safe and executor tasks share nothing); for the
  * ~KB documents this targets, allocation is noise next to the deflate
  * itself.
  *
  * Determinism: raw deflate (nowrap, fixed level, default strategy) is
  * deterministic for a given zlib build, and the JDK bundles its own —
  * so results are stable within a cluster. Cross-engine oracles must
  * not compare raw lengths (no SQL replica exists); q157 pins
  * class-separation flags on planted inputs instead, with wide margins
  * against zlib-version drift.
  */
case class DeflateLen(child: Expression, level: Int)
    extends UnaryExpression with CodegenFallback {

  require(level >= 1 && level <= 9, s"deflate level must be in [1,9], got $level")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got $t")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_deflate_len"

  protected override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val d = new java.util.zip.Deflater(level, /* nowrap = */ true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) {
        val n = d.deflate(buf)
        total += n
      }
      total
    } finally d.end()
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}
