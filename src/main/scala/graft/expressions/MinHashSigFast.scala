package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fast k-permutation MinHash over PRE-HASHED shingles: input is
  * `array<long>` (e.g. `transform(shingles, s -> xxhash64(s))`), output
  * is `array<long>` of per-permutation minima of `a_i * h + b_i`
  * (unsigned 64-bit order).
  *
  * This is the non-oracle scale path next to [[MinHashSig]]: the
  * salted-md5 family costs one digest per (shingle × permutation) —
  * engine-portable and DuckDB-replicable, but ~24M digests at sf0.1.
  * Here each shingle is hashed ONCE (xxhash64, codegen'd upstream) and
  * each permutation is a multiply-add, so k signatures cost k fused
  * multiply-adds per shingle. Same banding/LSH math applies; collision
  * behavior is the standard 2-universal-permutation approximation.
  * Cross-engine reproducibility is NOT provided (xxhash64 seeds are
  * Spark-internal), which is why the LSH dedup built on this is
  * spec-verified against the exact/md5 variants rather than
  * oracle-matched.
  *
  * Permutation constants derive from SplitMix64 of the permutation
  * index — deterministic across runs and JVMs; multipliers are forced
  * odd (bijective modulo 2^64).
  */
case class MinHashSigFast(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0 && k <= 128, s"k must be in [1,128], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> input, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // empty/all-null input yields a null signature (min of nothing)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_fast"

  override protected def withNewChildInternal(newChild: Expression): MinHashSigFast =
    copy(child = newChild)

  // cached once per expression instance — deriving them per row would
  // cost 2 allocations + 2k splitmix rounds on every interpreted eval
  @transient private lazy val asCached: Array[Long] = MinHashSigFast.mulConsts(k)
  @transient private lazy val bsCached: Array[Long] = MinHashSigFast.addConsts(k)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val as = asCached
    val bs = bsCached
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, -1L) // unsigned max
    var seen = false
    var e = 0
    while (e < n) {
      if (!arr.isNullAt(e)) {
        seen = true
        val h = arr.getLong(e)
        var i = 0
        while (i < k) {
          val v = as(i) * h + bs(i)
          if (java.lang.Long.compareUnsigned(v, mins(i)) < 0) mins(i) = v
          i += 1
        }
      }
      e += 1
    }
    if (!seen) null
    else new GenericArrayData(mins.map(m => m: Any))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("mulConsts", MinHashSigFast.mulConsts(k), "long[]")
    val bsRef = ctx.addReferenceObj("addConsts", MinHashSigFast.addConsts(k), "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      val seen = ctx.freshName("seen")
      val n = ctx.freshName("n")
      val e = ctx.freshName("e")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |final long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, -1L);
         |boolean $seen = false;
         |final int $n = $c.numElements();
         |for (int $e = 0; $e < $n; $e++) {
         |  if (!$c.isNullAt($e)) {
         |    $seen = true;
         |    final long $h = $c.getLong($e);
         |    for (int $i = 0; $i < $k; $i++) {
         |      final long $v = $asRef[$i] * $h + $bsRef[$i];
         |      if (Long.compareUnsigned($v, $mins[$i]) < 0) $mins[$i] = $v;
         |    }
         |  }
         |}
         |if (!$seen) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }
}

object MinHashSigFast {
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private[expressions] def mulConsts(k: Int): Array[Long] =
    Array.tabulate(k)(i => splitmix64(2L * i) | 1L) // odd → bijective mod 2^64
  private[expressions] def addConsts(k: Int): Array[Long] =
    Array.tabulate(k)(i => splitmix64(2L * i + 1))
}
