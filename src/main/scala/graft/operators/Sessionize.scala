package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands sessionization: number each key's events into
  * sessions that break wherever the caller's gap predicate fires. The
  * shared kernel behind session counting (q45), concurrent-session
  * intervals (q138), event debounce (q143), and in-session funnels
  * (q145) — one window shuffle on the key, two window passes (lag +
  * running sum), no joins.
  *
  * The break predicate sees (current ts, previous ts) as columns so the
  * time axis can be anything orderable — epoch micros with a numeric
  * gap, timestamps with an INTERVAL, versions with a step bound.
  */
object Sessionize {

  /** Append a `sid` column (1-based, per key, in (tsCol, tieCol)
    * order). Keys may be MULTI-column — pass them as columns, never
    * string-folded (a separator-concat key silently merges
    * (null, "3|x") with (3, "x")). `newSession(cur, prev)` decides a
    * break; the first event of a key always opens session 1 (prev is
    * null there, the predicate is not consulted). The output carries
    * the input columns + `sid`; the two internal working names are
    * refused on input like `sid` is, not silently clobbered.
    */
  def mark(
      df: DataFrame, keyCols: Seq[String], tsCol: String, tieCol: String)(
      newSession: (Column, Column) => Column): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    Seq("sid", "__prev", "__new").foreach(r =>
      require(!df.columns.contains(r),
        s"input must not carry a '$r' column (reserved by Sessionize)"))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol), col(tieCol))
    df
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || newSession(col(tsCol), col("__prev")), 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new")
  }

  /** Numeric-axis convenience: break when `cur - prev > gap`. */
  def markByGap(
      df: DataFrame, keyCols: Seq[String], tsCol: String, tieCol: String,
      gap: Long): DataFrame =
    mark(df, keyCols, tsCol, tieCol)((cur, prev) => cur - prev > gap)

  /** Per-session intervals: (keys..., sid, lo, hi) — min/max of the
    * time axis inside each session (the q138 shape). */
  def intervals(
      df: DataFrame, keyCols: Seq[String], tsCol: String, tieCol: String,
      gap: Long): DataFrame =
    markByGap(df, keyCols, tsCol, tieCol, gap)
      .groupBy((keyCols :+ "sid").map(col): _*)
      .agg(min(col(tsCol)).as("lo"), max(col(tsCol)).as("hi"))
}
