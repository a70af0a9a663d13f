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
        -- floor-align via the floored-modulo idiom (((x % d) + d) % d):
        -- DuckDB's // truncates toward zero, which would diverge from
        -- Spark's floor-aligning window() for pre-1970 (negative-epoch)
        -- timestamps (advice r8)
        b AS (SELECT make_timestamp(
                epoch_us(ts)
                  - ((epoch_us(ts) % 900000000) + 900000000) % 900000000
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
            // malformed-tolerant per the q27/q51 idiom: get_json_object
            // nulls on bad JSON, try_cast nulls on non-numeric k (ANSI
            // cast would throw); a null variant forms its own group
            (expr("try_cast(get_json_object(props, '$.k') as long)") % 2)
              .as("variant"))
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
            CASE WHEN json_valid(props)
              THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 2
            END AS variant
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
      """)),

    // ---- q184: daily bounce rate — share of 30-minute-gap sessions
    //      (the q45 definition) containing exactly one event, by
    //      session-start day. Session ids come from the running sum of
    //      the gap flags inside ONE per-user window pass (same keyed
    //      exchange as the sessionize family); everything after is
    //      map-side-combined aggregation. Rates in exact ppm. ----
    GraftQuery(
      "q184_bounce_rate",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val sessions = Tables.events(s, d)
          .withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L)
              .otherwise(0L))
          .withColumn("sid", sum(col("new_session")).over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("sid"))
          .agg(count(lit(1)).as("n_events"), min(col("ts")).as("start_ts"))
        sessions
          .groupBy(to_date(col("start_ts")).cast("string").as("day"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounced"))
          .withColumn("bounce_ppm",
            expr("cast(1000000 * n_bounced div n_sessions as bigint)"))
      },
      Some("""
        WITH f AS (
          SELECT user_id, ts, event_id,
            CASE WHEN lag(ts, 1) OVER w IS NULL
                   OR ts > lag(ts, 1) OVER w + INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sid AS (
          SELECT user_id, ts,
            sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS sid
          FROM f),
        sess AS (
          SELECT user_id, sid, count(*) n_events, min(ts) start_ts
          FROM sid GROUP BY user_id, sid)
        SELECT strftime(CAST(start_ts AS DATE), '%Y-%m-%d') AS day,
          CAST(count(*) AS BIGINT) AS n_sessions,
          CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounced,
          CAST(1000000 * sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) // count(*)
            AS BIGINT) AS bounce_ppm
        FROM sess GROUP BY 1
      """)),

    // ---- q191: time-weighted average value per event type (TWAP) —
    //      each reading holds until the user's NEXT event, so its
    //      weight is that interval; the per-type mean is
    //      Σ(value·gap)/Σ(gap). The finance/metrics aggregation a
    //      plain AVG silently gets wrong when sampling is uneven. One
    //      per-user window pass for the gaps (lead), then one
    //      map-side-combined aggregate. Exact: value in floored
    //      micro-units, gaps in epoch micros, products in
    //      decimal(38,0)/HUGEINT, mean by truncating division. Last
    //      event per user has no successor — zero weight, dropped
    //      identically both engines. ----
    GraftQuery(
      "q191_twap_by_type",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"),
            floor(col("value") * 1000000).cast("long").as("v_micro"))
          .withColumn("gap_us",
            (unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts"))))
          .where(col("gap_us").isNotNull)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(expr("cast(v_micro as decimal(38,0)) * gap_us")).as("wsum"),
            sum(col("gap_us")).as("gsum"))
          .select(col("event_type"), col("n"),
            expr("cast(wsum div gsum as bigint)").as("twap_micro"),
            col("gsum").as("total_us"))
      },
      Some("""
        WITH g AS (
          SELECT event_type,
            CAST(floor(value * 1000000) AS BIGINT) v_micro,
            epoch_us(lead(ts, 1) OVER (PARTITION BY user_id
              ORDER BY ts, event_id)) - epoch_us(ts) AS gap_us
          FROM events),
        k AS (SELECT * FROM g WHERE gap_us IS NOT NULL)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(v_micro AS HUGEINT) * gap_us)
            // sum(CAST(gap_us AS HUGEINT)) AS BIGINT) AS twap_micro,
          CAST(sum(gap_us) AS BIGINT) AS total_us
        FROM k GROUP BY event_type
      """)),

    // ---- q195: new-vs-returning weekly split — per ISO week, how
    //      many active users are first-timers vs returning (the
    //      growth-vs-retention headline every product dashboard
    //      leads with). First-seen week per user is one aggregate
    //      (user-cardinality — joined back without a broadcast hint,
    //      AQE decides); weekly active is the distinct (user, week)
    //      set. All integers. ----
    GraftQuery(
      "q195_new_vs_returning",
      (s, d) => {
        val weekly = Tables.events(s, d)
          .select(col("user_id"),
            date_trunc("week", col("ts")).cast("date").as("week"))
          .distinct()
        val first = weekly.groupBy(col("user_id"))
          .agg(min(col("week")).as("first_week"))
        // no broadcast hint: `first` is user-cardinality (fact-scale,
        // not a dimension) — forcing a broadcast risks driver memory
        // at larger SFs; AQE picks broadcast when it actually fits
        // (advice r8)
        weekly.join(first, Seq("user_id"))
          // flag BEFORE the groupBy: the group key is aliased to the
          // same name as the input column, and a post-alias reference
          // would be ambiguous
          .withColumn("is_new",
            when(col("week") === col("first_week"), 1L).otherwise(0L))
          .groupBy(col("week").cast("string").as("week"))
          .agg(sum(col("is_new")).as("n_new"),
            (count(lit(1)) - sum(col("is_new"))).as("n_returning"))
      },
      Some("""
        WITH weekly AS (
          SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) wk
          FROM events),
        fw AS (
          SELECT user_id, min(wk) first_wk FROM weekly GROUP BY user_id)
        SELECT strftime(w.wk, '%Y-%m-%d') AS week,
          CAST(sum(CASE WHEN w.wk = f.first_wk THEN 1 ELSE 0 END) AS BIGINT)
            AS n_new,
          CAST(sum(CASE WHEN w.wk <> f.first_wk THEN 1 ELSE 0 END) AS BIGINT)
            AS n_returning
        FROM weekly w JOIN fw f USING (user_id)
        GROUP BY 1
      """)),

    // ---- q196: peak sliding-window load — the highest event count
    //      any 5-minute window ever saw, with when it happened (the
    //      capacity-planning number). Events bucket to minutes (one
    //      map-side-combined aggregate over a BOUNDED time-series
    //      domain), the 5-minute rolling sum runs as a RANGE frame
    //      over the minute series, and the peak is a distributed
    //      top-1. Ties break on the window start. ----
    GraftQuery(
      "q196_peak_rate",
      (s, d) => {
        val perMin = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 60000000").as("m"))
          .groupBy(col("m")).agg(count(lit(1)).as("n"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("m")).rangeBetween(-4, 0)
        perMin
          .withColumn("win5", sum(col("n")).over(w))
          .orderBy(col("win5").desc, col("m"))
          .limit(1)
          // the trailing frame at row m covers minutes [m-4, m] — the
          // window STARTS four minutes before the anchor row
          .select(
            date_format(to_timestamp((col("m") - 4) * 60), "yyyy-MM-dd HH:mm:ss")
              .as("window_start_minute"),
            col("win5").as("peak_5min_events"))
      },
      Some("""
        WITH perMin AS (
          SELECT epoch_us(ts) // 60000000 AS m, CAST(count(*) AS BIGINT) n
          FROM events GROUP BY 1),
        r AS (
          SELECT m, sum(n) OVER (ORDER BY m RANGE BETWEEN 4 PRECEDING
            AND CURRENT ROW) win5
          FROM perMin)
        SELECT strftime(make_timestamp((m - 4) * 60000000), '%Y-%m-%d %H:%M:%S')
            AS window_start_minute,
          CAST(win5 AS BIGINT) AS peak_5min_events
        FROM r ORDER BY win5 DESC, m LIMIT 1
      """)),

    // ---- q202: click→purchase conversion by hour of day — for every
    //      click, did a purchase follow within the hour (the
    //      tolerance-bounded forward as-of, operators.AsOfJoin — same
    //      one-shuffle union+window plan as q110/q129), rolled up by
    //      the click's local hour. Rates in exact ppm; the oracle
    //      replicates the as-of with the q110 following-frame idiom
    //      plus the tolerance cut. ----
    GraftQuery(
      "q202_conversion_by_hour",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.where(col("event_type") === "click")
        val purchases = ev.where(col("event_type") === "purchase")
        graft.operators.AsOfJoin.forwardWithin(
            clicks, purchases, "user_id", "ts", "ts", "event_id",
            // the result carries user_id + ts already, and nothing
            // downstream reads the click's event_id — an empty
            // leftCols keeps the one-shuffle union row narrow
            leftCols = Seq(), tolerance = expr("INTERVAL 1 HOUR"))
          .groupBy(hour(col("ts")).cast("long").as("hour_of_day"))
          .agg(count(lit(1)).as("n_clicks"),
            sum(when(col("asof_event_id").isNotNull, 1L).otherwise(0L))
              .as("n_converted"))
          .withColumn("cvr_ppm",
            expr("cast(1000000 * n_converted div n_clicks as bigint)"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id, ts, event_id, event_type FROM events
          WHERE event_type IN ('click', 'purchase')),
        w AS (
          SELECT user_id, ts, event_id, event_type,
            -- null-payload purchases can't be picked by the as-of
            -- (its payload picker skips them); skip them here too
            first_value(CASE WHEN event_type = 'purchase' AND event_id IS NOT NULL
                        THEN ts END IGNORE NULLS)
              OVER (PARTITION BY user_id
                    ORDER BY ts, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END,
                             CASE WHEN event_type = 'purchase' THEN event_id END
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_pts
          FROM ev)
        SELECT CAST(hour(ts) AS BIGINT) AS hour_of_day,
          CAST(count(*) AS BIGINT) AS n_clicks,
          CAST(sum(CASE WHEN next_pts IS NOT NULL
                     AND next_pts <= ts + INTERVAL 1 HOUR
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
          CAST(1000000 * sum(CASE WHEN next_pts IS NOT NULL
                     AND next_pts <= ts + INTERVAL 1 HOUR
                   THEN 1 ELSE 0 END) // count(*) AS BIGINT) AS cvr_ppm
        FROM w WHERE event_type = 'click'
        GROUP BY 1
      """))
  )
}
