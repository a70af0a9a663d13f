package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass column profiling — the ANALYZE/data-quality sweep a
  * pipeline runs before trusting a new drop: per column, null count,
  * exact distinct count, min and max (canonicalized to strings by the
  * caller so heterogeneous columns fit one tidy result).
  *
  * Shape: ONE scan feeding two aggregations that share its exchange
  * (ReusedExchange — the table is read once):
  *
  *  - a NARROW pass computing every column's null count and native
  *    min/max together (string-typed min would be lexicographic —
  *    "9999" < "14999" fails; `canon` renders the aggregated extreme
  *    for output only);
  *  - the exact distinct counts over a SKINNY exploded
  *    (column, value-as-string) stream, two-level: local+global dedup
  *    on the pair, then a per-column count. The string detour is
  *    injective for atomic non-binary types (each distinct native
  *    value renders distinctly), and the 2-column grouping key keeps
  *    the hash probes and the generated code small — the previous
  *    single-agg formulation expanded every row ×(cols+1) into a
  *    (gid + cols)-keyed aggregate whose partial stage alone cost more
  *    than this whole plan (3.2 s → ~1 s at sf0.1, q111).
  *
  * Columns with a non-atomic or binary type (where a string render is
  * not injective — two different arrays can print alike) fall back to
  * the classic `countDistinct` Expand inside the narrow pass, trading
  * the cheaper plan for unconditional exactness.
  *
  * For approximate profiling at extreme cardinality swap the distinct
  * pass for the KMV sketch (expressions.KmvDistinct) — same shape.
  */
object Profile {

  /** Tidy stats for `cols`: (column, n_nulls, n_distinct, min_v, max_v).
    * min/max aggregate on the NATIVE values; `canon` renders the
    * aggregated extreme for output (cast/format chosen by the caller so
    * both engines print identically).
    */
  def summary(
      df: DataFrame, cols: Seq[String],
      canon: (String, Column) => Column = (_, v) => v.cast("string")): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    // fanOut: a small table often arrives as ONE scan partition and
    // both aggregations below are CPU-bound — spread them. At the
    // 100 TB design point the scan is naturally wide and this is a
    // no-op; the exchange it adds is shared by both passes.
    val src = graft.core.Partitioning.fanOut(df)
    val stringSafe = cols.forall { c =>
      df.schema(c).dataType match {
        case _: NumericType | StringType | BooleanType | DateType |
            TimestampType | TimestampNTZType => true
        case _ => false
      }
    }
    val aggs = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"_nulls_$c"),
        min(col(c)).as(s"_min_$c"),
        max(col(c)).as(s"_max_$c")) ++
        (if (stringSafe) Nil else Seq(countDistinct(col(c)).as(s"_dist_$c")))
    }
    val one = src.agg(aggs.head, aggs.tail: _*)
    val rows = array(cols.map(c => struct(
      lit(c).as("column"),
      col(s"_nulls_$c").as("n_nulls"),
      (if (stringSafe) lit(0L) else col(s"_dist_$c")).as("n_distinct"),
      canon(c, col(s"_min_$c")).as("min_v"),
      canon(c, col(s"_max_$c")).as("max_v"))): _*)
    val base = one.select(explode(rows).as("s")).select(col("s.*"))
    if (!stringSafe) base
    else {
      // float/double renders are injective EXCEPT signed zero: -0.0 and
      // 0.0 print differently but aggregate equality (countDistinct,
      // the oracle's count(DISTINCT)) treats them as one value. Adding
      // +0.0 is the IEEE identity for every double except -0.0 → 0.0,
      // so it normalizes exactly the problem case (NaN stays NaN —
      // one rendered value, matching countDistinct's one NaN class).
      def rendered(c: String): Column = df.schema(c).dataType match {
        case DoubleType => (col(c) + lit(0.0)).cast("string")
        case FloatType  => (col(c) + lit(0.0f)).cast("string")
        case _          => col(c).cast("string")
      }
      val tidy = src.select(explode(array(cols.map(c =>
          struct(lit(c).as("column"), rendered(c).as("_v"))): _*)).as("s"))
        .select(col("s.*"))
      // ONE exchange for the whole distinct pipeline: hash(column)
      // clusters every (column, _v) pair AND every column group, so
      // both aggregates below run exchange-free on top of it (subset
      // clustering). Parallelism caps at |cols| tasks — the trade is
      // deliberate: one fewer shuffle + one fewer codegen stage beats
      // 32-way spread for a per-column pipeline this skinny.
      val dist = tidy.where(col("_v").isNotNull)
        .repartition(col("column"))
        .dropDuplicates("column", "_v")
        .groupBy(col("column")).agg(count(lit(1)).as("_nd"))
      // left join + coalesce: an all-null column has no surviving
      // (column, value) pair but must still report n_distinct = 0
      base.drop("n_distinct")
        .join(dist, Seq("column"), "left")
        .select(col("column"), col("n_nulls"),
          coalesce(col("_nd"), lit(0L)).as("n_distinct"),
          col("min_v"), col("max_v"))
    }
  }
}
