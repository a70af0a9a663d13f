package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wide↔long reshaping (SURVEY.md §2.3; reference `src/main.py:45,53`). */
object Reshape {

  /** Melt / unpivot (R1): fold every non-id column into (varName, valName)
    * pairs. Value columns are computed from the schema at plan-build time
    * (the reference's column set varies per input file). Uses Spark's
    * native `Unpivot` logical node — no shuffle, streams through
    * whole-stage codegen.
    */
  def unpivot(
      df: DataFrame, ids: Seq[String],
      varName: String = "Category", valName: String = "Value"): DataFrame = {
    val valueCols = df.columns.filterNot(ids.contains)
    df.unpivot(ids.map(col).toArray, valueCols.map(col), varName, valName)
  }

  /** Pivot long→wide (R2) with the reference's fail-loud uniqueness
    * contract (N3/D4): pandas `DataFrame.pivot` raises on duplicate
    * (index, pivotCol) keys where Spark's `pivot().agg(first)` would
    * silently pick one. We assert explicitly and report offending keys.
    *
    * The explicit `values` list avoids Spark's extra distinct-scan job
    * and keeps deterministic column order (the reference's value set is
    * closed: Number / Number_Vaccinated).
    */
  def pivotAsserted(
      df: DataFrame, index: Seq[String], pivotCol: String,
      values: Seq[String], valueCol: String): DataFrame = {
    val keys = index :+ pivotCol
    val dups = df.groupBy(keys.map(col): _*).count()
      .where(col("count") > 1).limit(20).collect()
    if (dups.nonEmpty)
      throw new IllegalStateException(
        s"pivot grain (${keys.mkString(", ")}) not unique; first duplicates: " +
          dups.map(_.toString).mkString("; "))
    df.groupBy(index.map(col): _*)
      .pivot(pivotCol, values)
      .agg(first(col(valueCol)))
  }
}
