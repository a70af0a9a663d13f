package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** ALL hyperplane-LSH signatures of a vector in ONE pass: for each of
  * `tables` hash tables, the `bits`-bit sign mask of the vector's
  * projections onto that table's `bits` literal hyperplanes.
  *
  * Bit-parity contract: each projection is the SAME sequential
  * left-to-right fold as [[ArrayDotProduct]] over the identical
  * ±1 plane constants (Similarity.planeSigns), and a bit is set only
  * when the projection is strictly positive — so the produced buckets
  * are bit-identical to the composed `when(dot(v, planeLit) > 0, …)`
  * tree this replaces, and the DuckDB oracles (which replicate that
  * tree with embedded literals) transfer unchanged.
  *
  * Why a custom Expression (SURVEY §7.5 preference (b)): the composed
  * tree evaluates `tables × bits` separate folds, each re-reading the
  * vector through ArrayData AND re-constructing its 64-element literal
  * plane via CreateArray per row — at auto-sized widths (10+ bits ×
  * 8 tables at sf1) that tree dominated the LSH family's runtime.
  * Here the plane matrix is one flat `double[]` reference and the
  * whole signature block is three nested primitive loops inside
  * whole-stage codegen.
  *
  * Degenerate-input semantics mirror the composed tree exactly: a
  * vector of the wrong length or with a null element made every dot
  * null, hence every bit unset — here the signature array is all
  * zeros. (A NULL vector returns null; callers coalesce to the zero
  * array, which is what the `when` tree produced.)
  */
case class HyperplaneSigs(
    child: Expression, planes: Array[Double],
    tables: Int, bits: Int, dims: Int)
  extends UnaryExpression {

  require(tables >= 1 && bits >= 1 && bits <= 30 && dims >= 1,
    s"$prettyName: bad shape tables=$tables bits=$bits dims=$dims")
  require(planes.length == tables * bits * dims,
    s"$prettyName: plane matrix length ${planes.length} != $tables*$bits*$dims")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double> input, got $t")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_sigs"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val sigs = new Array[Int](tables)
    var valid = v.numElements() == dims
    if (valid) {
      var d = 0
      while (valid && d < dims) { if (v.isNullAt(d)) valid = false; d += 1 }
    }
    if (valid) {
      var t = 0
      while (t < tables) {
        var sig = 0
        var p = 0
        while (p < bits) {
          val off = (t * bits + p) * dims
          var s = 0d
          var d = 0
          while (d < dims) { s += v.getDouble(d) * planes(off + d); d += 1 }
          if (s > 0) sig |= 1 << p
          p += 1
        }
        sigs(t) = sig
        t += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val pl = ctx.addReferenceObj("planes", planes, "double[]")
      val sigs = ctx.freshName("sigs")
      val valid = ctx.freshName("valid")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      val off = ctx.freshName("off")
      s"""
         |final int[] $sigs = new int[$tables];
         |boolean $valid = $c.numElements() == $dims;
         |if ($valid) {
         |  for (int $d = 0; $d < $dims; $d++) {
         |    if ($c.isNullAt($d)) { $valid = false; break; }
         |  }
         |}
         |if ($valid) {
         |  for (int $t = 0; $t < $tables; $t++) {
         |    int $sig = 0;
         |    for (int $p = 0; $p < $bits; $p++) {
         |      final int $off = ($t * $bits + $p) * $dims;
         |      double $s = 0.0;
         |      for (int $d = 0; $d < $dims; $d++) {
         |        $s += $c.getDouble($d) * $pl[$off + $d];
         |      }
         |      if ($s > 0) $sig |= 1 << $p;
         |    }
         |    $sigs[$t] = $sig;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sigs);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigs =
    copy(child = newChild)
}
