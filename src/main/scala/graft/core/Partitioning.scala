package graft.core

import org.apache.spark.sql.DataFrame

/** Partition-shape helpers shared by the operator families. */
object Partitioning {

  /** Widen an under-partitioned source before a CPU-bound per-row
    * stage: a small parquet file is ONE scan partition
    * (`maxPartitionBytes` is a BYTE heuristic), which serializes
    * tokenize/shingle/hash/dot-product work on a single core. Bytes are
    * tiny in that regime, compute is not, so the repartition is pure
    * win; already-wide inputs pass through untouched.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
