package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.core.Tables
import graft.functions.Exact.sumExact6

/** Event analytics round 3 (round 8, third session): hopping (sliding)
  * window aggregation — q44's tumbling counterpart where each event
  * lands in length/hop overlapping windows.
  */
object EventQueries3 {

  val queries: Seq[GraftQuery] = Seq(

    // ---- q176: hopping-window event volume — 1-hour windows sliding
    //      every 15 minutes, so each event contributes to exactly 4
    //      windows (the smoothed load curve an alerting pipeline
    //      reads; the batch mirror of Structured Streaming's
    //      window(ts, "1 hour", "15 minutes")). Spark's window()
    //      expands the 4 assignments BEFORE the shuffle, so this is
    //      one map-side-combined aggregate — no self-join, no
    //      4-window explode shuffle. Sums are decimal-exact
    //      (order-independent) per the q44 discipline; the oracle
    //      reproduces Spark's epoch-aligned window starts via integer
    //      microsecond arithmetic. ----
    GraftQuery(
      "q176_events_hopping",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour", "15 minutes"))
          .agg(count(lit(1)).as("n"), sumExact6(col("value")).as("sum_value"))
          .select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
            col("n"), col("sum_value")),
      Some("""
        WITH k AS (SELECT unnest([0, 1, 2, 3]) AS i),
        b AS (SELECT make_timestamp(
                epoch_us(ts) // 900000000 * 900000000
                  - CAST(i AS BIGINT) * 900000000) AS ws,
                value
              FROM events CROSS JOIN k)
        SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS w_start,
          count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM b GROUP BY 1
      """))
  )
}
