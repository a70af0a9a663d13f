package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.core.Tables

/** SQL-surface breadth, round 4: higher-order array lambdas (q98) and
  * a generated date spine with zero-fill (q99). Both stay integer /
  * string-valued so the DuckDB oracle hash-matches exactly.
  */
object Relational5 {

  val queries: Seq[GraftQuery] = Seq(

    // ---- q98: higher-order functions over word arrays — transform /
    //      filter / aggregate / zip_with / array_distinct in one
    //      projection. All codegen'd builtin lambdas (no UDFs); DuckDB
    //      mirrors with list_transform / list_filter / list_reduce /
    //      list_zip. Counts and sums are exact integers. ----
    GraftQuery(
      "q98_higher_order",
      (s, d) => {
        val w = graft.functions.TextFunctions.tokens(col("text"))
        Tables.documents(s, d).where(col("doc_id") < 100)
          .select(col("doc_id"), w.as("w"))
          .select(
            col("doc_id"),
            size(filter(col("w"), x => length(x) > lit(4))).cast("long").as("n_long"),
            aggregate(transform(col("w"), x => length(x).cast("long")),
              lit(0L), (acc, x) => acc + x).as("total_len"),
            array_max(transform(col("w"), x => length(x))).cast("long").as("max_len"),
            size(array_distinct(col("w"))).cast("long").as("n_distinct"),
            // positions whose word equals its mirror-position word
            size(filter(zip_with(col("w"), reverse(col("w")), (a, b) => a === b),
              x => x)).cast("long").as("n_mirror"))
      },
      Some("""
        WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') w
                   FROM documents WHERE doc_id < 100)
        SELECT doc_id,
          CAST(len(list_filter(w, x -> length(x) > 4)) AS BIGINT) AS n_long,
          CAST(list_reduce(list_transform(w, x -> length(x)), (a, b) -> a + b) AS BIGINT) AS total_len,
          CAST(list_aggregate(list_transform(w, x -> length(x)), 'max') AS BIGINT) AS max_len,
          CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
          CAST(len(list_filter(list_zip(w, list_reverse(w)), p -> p[1] = p[2])) AS BIGINT) AS n_mirror
        FROM t
      """)),

    // ---- q99: generated date spine + zero-fill — `sequence()` builds
    //      the monthly calendar (no source scan), a left join against
    //      monthly order counts keeps empty months (orders stop at
    //      2001-08, so 2001-09..12 land as zero rows — the case a plain
    //      GROUP BY silently drops). The spine is a 1-row driver-side
    //      relation: it broadcasts, the orders side never reshuffles
    //      beyond its aggregation. ----
    GraftQuery(
      "q99_date_spine",
      (s, d) => {
        val spine = s.range(1).select(explode(sequence(
          to_date(lit("2001-01-01")), to_date(lit("2001-12-01")),
          expr("interval 1 month"))).as("m"))
        val monthly = Tables.orders(s, d)
          .where(col("o_orderdate") >= to_timestamp(lit("2001-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("2002-01-01")))
          .groupBy(trunc(col("o_orderdate").cast("date"), "month").as("m"))
          .agg(count(lit(1)).as("n_orders"))
        spine.join(monthly, Seq("m"), "left")
          .select(date_format(col("m"), "yyyy-MM").as("month"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      },
      Some("""
        WITH spine AS (
          SELECT CAST(u AS DATE) m
          FROM unnest(generate_series(DATE '2001-01-01', DATE '2001-12-01', INTERVAL 1 MONTH)) t(u)),
        monthly AS (
          SELECT CAST(date_trunc('month', o_orderdate) AS DATE) m, count(*) n_orders
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '2001-01-01' AND o_orderdate < TIMESTAMP '2002-01-01'
          GROUP BY 1)
        SELECT strftime(spine.m, '%Y-%m') AS month,
          CAST(COALESCE(monthly.n_orders, 0) AS BIGINT) AS n_orders
        FROM spine LEFT JOIN monthly ON monthly.m = spine.m
      """))
  )
}
