package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Expression↔Column bridge `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Custom Catalyst
  * expressions still need it, so this shim lives inside the sql package
  * namespace — the standard extension-library pattern.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register functions on a LIVE session's registry (sessionState is
    * private[sql]; builder-time extensions don't reach pre-existing
    * sessions). Idempotent.
    */
  def ensureRegistered(
      spark: org.apache.spark.sql.SparkSession,
      regs: Seq[(String,
        org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
        Seq[Expression] => Expression)]): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    regs.foreach { case (name, info, builder) =>
      val fid = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
      if (!registry.functionExists(fid)) registry.registerFunction(fid, info, builder)
    }
  }
}
