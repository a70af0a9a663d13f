package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** k-permutation MinHash signature of an `array<string>` shingle set.
  *
  * Bit-identical to `transform(sequence(0,k-1), i ->
  * array_min(transform(sh, s -> md5(concat(i,'|',s)))))` — the salted-md5
  * family whose lexicographic-min hex strings the DuckDB oracle
  * replicates — but ~k× cheaper: each shingle's UTF-8 bytes are encoded
  * once (not k times through concat), one thread-local MessageDigest is
  * reused (Catalyst's Md5 allocates one per call), and mins are tracked
  * as raw digest bytes (unsigned byte order == hex lexicographic order),
  * hex-encoded only k times at the end.
  *
  * CodegenFallback: the digest work dwarfs expression-dispatch overhead,
  * so interpreted eval with a tight loop wins over generated code that
  * would still call into MessageDigest.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k > 0 && k <= 64, s"k must be in [1,64], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> input, got $t")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  // Result is null for an empty/all-null shingle set even when the child
  // is non-nullable (e.g. a literal array()), so nullability cannot be
  // inherited from the child.
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  @transient private lazy val salts: Array[Array[Byte]] =
    Array.tabulate(k)(i => s"$i|".getBytes("UTF-8"))

  @transient private lazy val localDigest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = localDigest.get()
    val mins = new Array[Array[Byte]](k)
    var seen = 0
    var e = 0
    while (e < n) {
      if (!arr.isNullAt(e)) {
        seen += 1
        val sBytes = arr.getUTF8String(e).getBytes
        var i = 0
        while (i < k) {
          md.reset()
          md.update(salts(i))
          md.update(sBytes)
          val d = md.digest()
          if (mins(i) == null || unsignedLess(d, mins(i))) mins(i) = d
          i += 1
        }
      }
      e += 1
    }
    // empty or all-null shingle set: min is undefined → null signature
    // (the SQL equivalent yields null mins; our containsNull=false array
    // type means the whole result must be null, not an array of nulls)
    if (seen == 0) return null
    new GenericArrayData(mins.map(m => UTF8String.fromString(hex(m)): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
