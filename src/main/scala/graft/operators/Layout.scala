package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical data layout for scan pruning — the write-side half of
  * predicate pushdown. Parquet readers skip whole files and row groups
  * whose min/max statistics exclude the predicate; those statistics
  * are only selective if the writer CLUSTERED the data. At 100 TB this
  * is the difference between scanning 40 GB and scanning everything —
  * no reader-side cleverness recovers locality the writer threw away.
  *
  * - [[clusterBy]]: range-partition + sort by the hot predicate
  *   columns — optimal pruning for prefix predicates on those columns.
  * - [[zValue]]/[[zOrderBy]]: bit-interleaved Z-curve over two
  *   dimensions — each file covers a square-ish tile of (x, y) space,
  *   so BOTH single-dimension and box predicates prune (a plain sort
  *   gives one dimension perfect locality and the other none).
  *
  * Both only rearrange rows (narrow + one range shuffle): results of
  * any downstream query are unchanged — layout is pure physics.
  */
object Layout {

  /** Range-cluster into `nFiles` sorted shards on `cols`. */
  def clusterBy(df: DataFrame, nFiles: Int, cols: String*): DataFrame =
    df.repartitionByRange(nFiles, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)

  /** Z-curve value of two NON-NEGATIVE integer columns: bit i of x
    * lands at bit 2i, bit i of y at 2i+1, so Z-adjacent rows are
    * adjacent in a square tile of (x, y). `bits` per dimension (≤ 31;
    * values are masked — callers bucket real-valued columns first).
    * Pure builtin shift/mask expressions — codegen, no UDF.
    */
  def zValue(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits per dimension must be in [1,31], got $bits")
    val xi = x.cast("long"); val yi = y.cast("long")
    (0 until bits).map { i =>
      (shiftright(xi, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(yi, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** Cluster on the Z-curve of (xCol, yCol) into `nFiles` shards. The
    * z column is dropped — it exists only to order the write.
    */
  def zOrderBy(df: DataFrame, nFiles: Int, xCol: String, yCol: String,
      bits: Int = 21): DataFrame = {
    val zc = zValue(col(xCol), col(yCol), bits).as("_z")
    df.withColumn("_z", zc)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}
