package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Iterative operators ([[graft.operators.Components]]) must re-wrap
  * each round's checkpoint to RESET inherited plan statistics: a
  * checkpoint's LogicalRDD carries the ORIGINAL plan's stats as
  * originStats, and a loop whose plan self-joins makes sizeInBytes a
  * product of its inputs — the inherited estimate is raised to a
  * constant power every round and by round ~6 Catalyst's stats visitor
  * is multiplying BigInts with millions of digits.
  *
  * The public escape hatch (`createDataFrame(cp.rdd, schema)`) resets
  * stats but ALSO (a) forgets the checkpoint's hash layout — every
  * round's co-partitioned joins re-shuffle — and (b) round-trips every
  * row through the Row codec (`cp.rdd` deserializes InternalRow → Row,
  * `createDataFrame` encodes it back). This shim rebuilds the
  * LogicalRDD directly: same InternalRow RDD, same output attributes,
  * the physical partitioning carried over, fresh (empty) origin
  * stats/constraints. `private[sql]` access is the reason it lives in
  * the sql package namespace (the [[ColumnBridge]] pattern).
  */
object DatasetBridge {

  /** Re-wrap a checkpoint-backed frame with inherited stats DROPPED and
    * the checkpointed partitioning KEPT. The input must be a plain
    * eager checkpoint (its analyzed plan is a single LogicalRDD) —
    * anything else falls back to a stats-resetting wrap with layout
    * forgotten (correct, just without the co-partitioning).
    */
  def rewrapKeepingLayout(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    df.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val fresh = LogicalRDD(
          l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
          l.isStreaming, l.stream)(spark, None, None)
        org.apache.spark.sql.classic.Dataset.ofRows(spark, fresh)
      case _ =>
        spark.createDataFrame(df.rdd, df.schema)
    }
  }
}
