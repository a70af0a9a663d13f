package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.core.Tables

/** SQL-surface breadth, round-2 continuation: map construction and
  * inspection (q88), full-frame window value functions (q89), and
  * null-safe equality joins (q90). Outputs are canonicalized (sorted
  * join-strings, no raw maps/timestamps) so the DuckDB oracle compares
  * bit-for-bit.
  */
object Relational4 {

  val queries: Seq[GraftQuery] = Seq(

    // ---- q88: map functions — build a per-user event_type→count map
    //      (map_from_entries over a sorted entry list), inspect it with
    //      map_keys/size/element_at. Canonical string output: map key
    //      order is the sorted insertion order, deterministic in both
    //      engines. ----
    GraftQuery(
      "q88_map_ops",
      (s, d) => {
        val e = Tables.events(s, d).where(col("user_id") < 50)
        val perType = e.groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        perType.groupBy(col("user_id"))
          .agg(map_from_entries(
            array_sort(collect_list(struct(col("event_type"), col("n"))))).as("m"))
          .select(
            col("user_id"),
            size(col("m")).cast("long").as("n_types"),
            array_join(map_keys(col("m")), ",").as("types"),
            coalesce(element_at(col("m"), "purchase"), lit(0L)).as("n_purchase"))
      },
      Some("""
        WITH perType AS (
          SELECT user_id, event_type, count(*) AS n
          FROM events WHERE user_id < 50
          GROUP BY user_id, event_type)
        SELECT user_id,
          count(*) AS n_types,
          string_agg(event_type, ',' ORDER BY event_type) AS types,
          COALESCE(max(CASE WHEN event_type = 'purchase' THEN n END), 0) AS n_purchase
        FROM perType GROUP BY user_id
      """)),

    // ---- q89: window value functions — first/last/nth over the full
    //      per-user frame (explicit unbounded frame: last_value under
    //      the default frame is the CURRENT row, a classic trap both
    //      engines share). ----
    GraftQuery(
      "q89_window_values",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)
        Tables.events(s, d).where(col("user_id") < 50)
          .select(
            col("user_id"), col("event_id"),
            first(col("value")).over(w).as("first_v"),
            last(col("value")).over(w).as("last_v"),
            nth_value(col("value"), 2).over(w).as("second_v"))
      },
      Some("""
        SELECT user_id, event_id,
          first_value(value) OVER w AS first_v,
          last_value(value) OVER w AS last_v,
          nth_value(value, 2) OVER w AS second_v
        FROM events WHERE user_id < 50
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      """)),

    // ---- q90: null-safe equality join (<=> ≡ IS NOT DISTINCT FROM) —
    //      null keys match each other instead of vanishing, the contract
    //      plain equality can't express. ----
    GraftQuery(
      "q90_nullsafe_join",
      (s, d) => {
        val n = Tables.nation(s, d)
          .select(col("n_nationkey"), nullif(col("n_regionkey") % 3, lit(2)).as("grp"))
        n.as("a").join(n.as("b"),
            col("a.grp") <=> col("b.grp") && col("a.n_nationkey") < col("b.n_nationkey"))
          .groupBy(col("a.grp").as("grp"))
          .agg(count(lit(1)).as("n_pairs"))
      },
      Some("""
        WITH n AS (
          SELECT n_nationkey, nullif(n_regionkey % 3, 2) AS grp FROM nation)
        SELECT a.grp, count(*) AS n_pairs
        FROM n a JOIN n b
          ON a.grp IS NOT DISTINCT FROM b.grp AND a.n_nationkey < b.n_nationkey
        GROUP BY a.grp
      """)),

    // ---- q93: scalar string-function breadth — pad/translate/repeat/
    //      reverse/instr/split_part over part names (q15 covers
    //      trim/case/concat; this fills the rest of the everyday string
    //      toolbox). substring_index(s, d, n) ≡ DuckDB split_part for
    //      one field when n picks a single delimiter slot. ----
    GraftQuery(
      "q93_string_breadth",
      (s, d) =>
        Tables.part(s, d).where(col("p_partkey") < 200)
          .select(
            col("p_partkey"),
            lpad(col("p_brand"), 12, "*").as("brand_lpad"),
            rpad(col("p_type"), 10, ".").as("type_rpad"),
            translate(col("p_name"), "aeiou", "AEIOU").as("name_voweled"),
            repeat(left(col("p_name"), lit(2)), 3).as("prefix_x3"),
            reverse(col("p_name")).as("name_rev"),
            substring_index(col("p_name"), " ", 1).as("first_word"),
            instr(col("p_name"), "e").cast("long").as("first_e")),
      Some("""
        SELECT p_partkey,
          lpad(p_brand, 12, '*') AS brand_lpad,
          rpad(p_type, 10, '.') AS type_rpad,
          translate(p_name, 'aeiou', 'AEIOU') AS name_voweled,
          repeat(left(p_name, 2), 3) AS prefix_x3,
          reverse(p_name) AS name_rev,
          split_part(p_name, ' ', 1) AS first_word,
          CAST(instr(p_name, 'e') AS BIGINT) AS first_e
        FROM part WHERE p_partkey < 200
      """))
  )
}
