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
      """)),

    // ---- q182: A/B experiment readout — users assigned to a variant
    //      by the deterministic `k` prop of their FIRST event (ties on
    //      (ts, event_id) — the corpus-wide first-touch idiom),
    //      conversion = any later-or-equal purchase. Counts and ppm
    //      rates are exact integers; the assignment table is one
    //      per-user window pass, the conversion flag one semi-join.
    //      No per-event JSON UDF: get_json_object is the codegen'd
    //      builtin, evaluated once per user (the first event), not per
    //      event. ----
    GraftQuery(
      "q182_ab_test",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val assign = Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("user_id"), col("ts").as("first_ts"),
            (get_json_object(col("props"), "$.k").cast("long") % 2).as("variant"))
        val converted = Tables.events(s, d)
          .where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"))
        val conv = assign.join(converted, Seq("user_id"), "left")
          .groupBy(col("user_id"), col("variant"))
          .agg(max(when(col("ts") >= col("first_ts"), 1L).otherwise(0L))
            .as("is_conv"))
        conv.groupBy(col("variant"))
          .agg(count(lit(1)).as("n_users"),
            sum(coalesce(col("is_conv"), lit(0L))).as("n_converted"))
          .withColumn("cvr_ppm",
            expr("cast(1000000 * n_converted div n_users as bigint)"))
      },
      Some("""
        WITH a AS (
          SELECT user_id, ts AS first_ts,
            CAST(json_extract(props, '$.k') AS BIGINT) % 2 AS variant
          FROM (SELECT *, row_number() OVER
                  (PARTITION BY user_id ORDER BY ts, event_id) rn
                FROM events) t
          WHERE rn = 1),
        conv AS (
          SELECT a.user_id, a.variant,
            max(CASE WHEN e.ts >= a.first_ts THEN 1 ELSE 0 END) AS is_conv
          FROM a LEFT JOIN (SELECT user_id, ts FROM events
                            WHERE event_type = 'purchase') e
            ON e.user_id = a.user_id
          GROUP BY a.user_id, a.variant)
        SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
          CAST(sum(COALESCE(is_conv, 0)) AS BIGINT) AS n_converted,
          CAST(1000000 * sum(COALESCE(is_conv, 0)) // count(*) AS BIGINT) AS cvr_ppm
        FROM conv GROUP BY variant
      """))
  )
}
