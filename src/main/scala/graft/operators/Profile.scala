package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiling — the ANALYZE/data-quality sweep a
  * pipeline runs before trusting a new drop: per column, null count,
  * exact distinct count, min and max (canonicalized to strings by the
  * caller so heterogeneous columns fit one tidy result).
  *
  * Shape: ONE aggregation over the table computing every column's
  * stats together (the scan is the cost at 100 TB — never one pass per
  * column), then a literal-array explode into tidy (column, stat) rows
  * driver-side of the agg (6 rows from 1 — free). Exact distincts
  * expand into one Expand + aggregate; for approximate profiling at
  * extreme cardinality swap `countDistinct` for the KMV sketch
  * (expressions.KmvDistinct) — same one-pass shape.
  */
object Profile {

  /** Tidy stats for `cols`: (column, n_nulls, n_distinct, min_v, max_v).
    * min/max aggregate on the NATIVE values (string-typed min would be
    * lexicographic — "9999" < "14999" fails); `canon` renders the
    * aggregated extreme for output (cast/format chosen by the caller so
    * both engines print identically).
    */
  def summary(
      df: DataFrame, cols: Seq[String],
      canon: (String, Column) => Column = (_, v) => v.cast("string")): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val aggs = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"_nulls_$c"),
        countDistinct(col(c)).as(s"_dist_$c"),
        min(col(c)).as(s"_min_$c"),
        max(col(c)).as(s"_max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(cols.map(c => struct(
      lit(c).as("column"),
      col(s"_nulls_$c").as("n_nulls"),
      col(s"_dist_$c").as("n_distinct"),
      canon(c, col(s"_min_$c")).as("min_v"),
      canon(c, col(s"_max_$c")).as("max_v"))): _*)
    one.select(explode(rows).as("s")).select(col("s.*"))
  }
}
