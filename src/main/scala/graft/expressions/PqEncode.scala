package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization encoder: for each of the `m = cents.length`
  * subspaces, the index of the nearest centroid by squared L2 (ties to
  * the LOWEST index — first strict minimum, matching
  * `array_position(dists, array_min(dists))`).
  *
  * Why a custom Expression (SURVEY §7.5 / preference (b)): the builtin
  * formulation is an m×k literal tree of `aggregate(zip_with(slice…))`
  * higher-order lambdas — interpreted, one zipped allocation per
  * centroid per row; measured ~1 ms/row at m=8, k=16, d=64 (2.1 s for a
  * 2 000-row fixture), which is also a thousand-node plan for Catalyst
  * to analyze. This compiles to one tight primitive loop (m·k·subDim
  * multiply-adds, no allocation) inside whole-stage codegen.
  *
  * Null semantics: null input → null; an input of the wrong length or
  * with null elements → null result (the lambda tree instead yielded a
  * null CODE per subspace — indistinguishable downstream: both poison
  * the ADC fold to a null score).
  */
case class PqEncode(child: Expression, cents: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val m = cents.length
  private val subDim = cents.head.head.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got $t")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  private def encode(v: ArrayData): Any = {
    if (v.numElements() != m * subDim) return null
    var i = 0
    while (i < m * subDim) { if (v.isNullAt(i)) return null; i += 1 }
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cj = cents(j)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cj.length) {
        val cent = cj(c)
        var d = 0.0
        var t = 0
        while (t < subDim) {
          val diff = v.getDouble(j * subDim + t) - cent(t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", cents, "double[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val cj = ctx.freshName("cj")
      s"""
         |if ($v.numElements() != ${m * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < ${m * subDim}; $i++) {
         |    if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  }
         |}
         |if (!${ev.isNull}) {
         |  int[] $codes = new int[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    double[][] $cj = $centsRef[$j];
         |    int $best = 0;
         |    double $bestD = Double.MAX_VALUE;
         |    for (int $c = 0; $c < $cj.length; $c++) {
         |      double $d = 0.0;
         |      for (int $t = 0; $t < $subDim; $t++) {
         |        double $diff = $v.getDouble($j * $subDim + $t) - $cj[$c][$t];
         |        $d += $diff * $diff;
         |      }
         |      if ($d < $bestD) { $bestD = $d; $best = $c; }
         |    }
         |    $codes[$j] = $best;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** ADC score: Σ_j table(j·k + codes_j) — the asymmetric-distance lookup
  * sum over a per-query flat m×k table. Left-to-right fold, identical
  * accumulation order to the `aggregate(zip_with(codes, sequence…))`
  * builtin chain it replaces (and to the driver-side table builder).
  * Null if either array is null, a code is null/out of range, or the
  * table is shorter than m·k.
  */
case class AdcScore(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<double>), got $l and $r")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_adc_score"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val tbl = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val idx = j * k + codes.getInt(j)
      if (idx < 0 || idx >= tbl.numElements() || tbl.isNullAt(idx)) return null
      acc += tbl.getDouble(idx)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, tbl) => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      s"""
         |final int $m = $codes.numElements();
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  if ($codes.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  final int $idx = $j * $k + $codes.getInt($j);
         |  if ($idx < 0 || $idx >= $tbl.numElements() || $tbl.isNullAt($idx)) {
         |    ${ev.isNull} = true; break;
         |  }
         |  $acc += $tbl.getDouble($idx);
         |}
         |if (!${ev.isNull}) ${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}
