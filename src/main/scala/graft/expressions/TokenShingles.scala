package graft.expressions

import java.util.{HashSet => JHashSet}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused lowercase → whitespace-tokenize → n-gram shingle → distinct
  * kernel over raw text.
  *
  * Semantics are EXACTLY `array_distinct(transform(sequence(1,
  * size(tk)-(n-1)), i -> concat_ws(' ', tk[i..i+n-1])))` where
  * `tk = regexp_extract_all(lower(text), '\S+', 0)` — the formulation
  * the DuckDB oracles replicate — for any input with size(tk) >= n,
  * and the empty array below that (the lambda formulation needs a
  * size guard; this kernel doesn't):
  * - `lower` is UTF8String.toLowerCase, the same call Spark's Lower
  *   makes under the default UTF8_BINARY collation;
  * - Java-regex `\s` is exactly {space, \t, \n, \x0B, \f, \r} (RE2 in
  *   DuckDB agrees: [\t\n\f\r\v ]), so a byte scan over those six
  *   ASCII separators splits identically — multi-byte UTF-8 sequences
  *   never contain ASCII bytes, and non-ASCII whitespace (e.g.  )
  *   is \S on both engines (kept inside tokens);
  * - grams join n consecutive tokens with a single 0x20, the
  *   `concat_ws(' ', ...)` byte sequence (tokens never contain spaces,
  *   so the join is injective);
  * - distinct preserves FIRST-OCCURRENCE order, same as array_distinct.
  *
  * Why it exists: the lambda chain walks interpreted higher-order
  * evals (regexp extract_all + transform + per-gram concat_ws +
  * array_distinct) allocating intermediate arrays per row — measured
  * as the dominant cost of the corpus-pipeline queries. This kernel is
  * one pass over the bytes inside whole-stage codegen (static-call
  * doGenCode), shared by every shingle consumer (dedup, decontaminate,
  * repetition, TF-IDF).
  */
case class TokenShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got $t")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_token_shingles"

  override def nullSafeEval(input: Any): Any =
    TokenShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TokenShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): TokenShingles =
    copy(child = newChild)
}

object TokenShingles {

  /** Separator set of Java-regex \s (== RE2 \s): space \t \n \x0B \f \r. */
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  /** Token runs as (start, end) offset pairs into `bytes`. */
  private def tokenOffsets(bytes: Array[Byte]): (Array[Int], Int) = {
    val offs = new ArrayBuffer[Int](64)
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isWs(bytes(i))) i += 1
        offs += start; offs += i
      }
    }
    (offs.toArray, offs.length / 2)
  }

  /** The n-gram starting at token index i: n tokens joined by a single
    * 0x20 (the `concat_ws(' ', ...)` byte sequence). Shared by BOTH
    * gram kernels so the "identical per-gram bytes" invariant the
    * oracles rely on lives in exactly one place.
    */
  @inline private def gramAt(
      bytes: Array[Byte], offs: Array[Int], i: Int, n: Int): UTF8String = {
    // gram byte length: token bytes + (n-1) single-space joints
    var glen = n - 1
    var k = 0
    while (k < n) {
      glen += offs(2 * (i + k) + 1) - offs(2 * (i + k))
      k += 1
    }
    val gb = new Array[Byte](glen)
    var pos = 0
    k = 0
    while (k < n) {
      if (k > 0) { gb(pos) = 0x20; pos += 1 }
      val s = offs(2 * (i + k)); val e = offs(2 * (i + k) + 1)
      System.arraycopy(bytes, s, gb, pos, e - s)
      pos += e - s
      k += 1
    }
    UTF8String.fromBytes(gb)
  }

  /** One-pass distinct n-gram array (first-occurrence order). */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val lower = text.toLowerCase
    val bytes = lower.getBytes // materialized copy iff offheap/offset != 0
    val (offs, nTok) = tokenOffsets(bytes)
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val seen = new JHashSet[UTF8String](math.min(nTok, 1 << 16))
    val out = new ArrayBuffer[Any](nTok - n + 1)
    var i = 0
    while (i <= nTok - n) {
      val gram = gramAt(bytes, offs, i, n)
      if (seen.add(gram)) out += gram
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** ALL n-grams in positional order (no distinct): element i is the
    * gram starting at 0-based token position i, so
    * `posexplode(computeAll(text, n))` yields the (start-pos, gram)
    * pairs positional matchers (SubstringDedup) consume. Identical
    * per-gram bytes to [[compute]]; empty below n tokens.
    */
  def computeAll(text: UTF8String, n: Int): ArrayData = {
    val lower = text.toLowerCase
    val bytes = lower.getBytes
    val (offs, nTok) = tokenOffsets(bytes)
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nTok - n + 1)
    var i = 0
    while (i <= nTok - n) {
      out(i) = gramAt(bytes, offs, i, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Lowercased token array of the SAME tokenization (one pass). */
  def tokenArray(text: UTF8String): ArrayData = {
    val lower = text.toLowerCase
    val bytes = lower.getBytes
    val (offs, nTok) = tokenOffsets(bytes)
    val out = new Array[Any](nTok)
    var t = 0
    while (t < nTok) {
      val s = offs(2 * t); val e = offs(2 * t + 1)
      val tb = new Array[Byte](e - s)
      System.arraycopy(bytes, s, tb, 0, e - s)
      out(t) = UTF8String.fromBytes(tb)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Token count of the SAME tokenization (byte scan, zero alloc) —
    * == `size(regexp_extract_all(lower(text), '\S+', 0))`. Lowercasing
    * cannot change \s-vs-\S class membership, so it's skipped.
    */
  def countTokens(text: UTF8String): Long = {
    val bytes = text.getBytes
    var i = 0
    var nTok = 0L
    val len = bytes.length
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        nTok += 1
        while (i < len && !isWs(bytes(i))) i += 1
      }
    }
    nTok
  }
}

/** Positional (non-distinct) variant of [[TokenShingles]]: ALL word
  * n-grams in start-position order — element i is the gram at 0-based
  * token position i. Semantics are exactly `transform(sequence(0,
  * size(tk)-n), i -> array_join(slice(tk, i+1, n), ' '))` for inputs
  * with ≥ n tokens and the empty array below (no size guard needed),
  * with `tk` the [[TokenArray]] tokenization.
  */
case class TokenShinglesAll(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got $t")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_token_shingles_all"

  override def nullSafeEval(input: Any): Any =
    TokenShingles.computeAll(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TokenShingles.computeAll($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): TokenShinglesAll =
    copy(child = newChild)
}

/** `regexp_extract_all(lower(text), '\S+', 0)` as a single byte scan
  * (see TokenShingles for the \s equivalence argument): the lowercased
  * token array every text operator tokenizes with, minus the regex
  * engine and per-match machinery.
  */
case class TokenArray(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got $t")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override def nullSafeEval(input: Any): Any =
    TokenShingles.tokenArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TokenShingles.tokenArray($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenArray =
    copy(child = newChild)
}

/** `size(regexp_extract_all(lower(text), '\S+', 0))` as a zero-alloc
  * byte scan (see TokenShingles for the \s equivalence argument).
  * Returns long (the cast every call site applied anyway).
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got $t")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_token_count"

  override def nullSafeEval(input: Any): Any =
    TokenShingles.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TokenShingles.countTokens($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}
