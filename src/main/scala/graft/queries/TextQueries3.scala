package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.core.Tables
import graft.functions.TextFunctions

/** Text-pipeline round 4: Gopher-style quality gating (q100) and
  * cross-document boilerplate n-gram detection (q101) — the two
  * filtering signals a C4/Gopher-shaped corpus prep applies before
  * dedup. Both are integer-exact so the DuckDB oracle hash-matches.
  */
object TextQueries3 {

  val queries: Seq[GraftQuery] = Seq(

    // ---- q100: Gopher-style quality rules, aggregated per language.
    //      Each rule is evaluated with integer cross-multiplication
    //      (3·nw ≤ Σlen ≤ 10·nw instead of a float mean; 5·distinct ≥ nw
    //      instead of a float type-token ratio) so pass counts are exact
    //      in both engines. One scan, one shuffle (the per-lang agg). ----
    GraftQuery(
      "q100_quality_gopher",
      (s, d) => {
        val w = TextFunctions.tokens(col("text"))
        val stops = Seq("the", "a", "of", "and", "to", "in")
        val flags = Tables.documents(s, d)
          .select(col("lang"),
            size(w).cast("long").as("nw"),
            aggregate(transform(w, x => length(x).cast("long")),
              lit(0L), (acc, x) => acc + x).as("sl"),
            size(filter(w, x => x.isin(stops: _*))).cast("long").as("ns"),
            size(array_distinct(w)).cast("long").as("nd"))
          .select(col("lang"),
            (col("nw") >= 20 && col("nw") <= 100000).as("r_len"),
            (col("sl") >= col("nw") * 3 && col("sl") <= col("nw") * 10).as("r_wordlen"),
            (col("ns") >= 2).as("r_stop"),
            (col("nd") * 5 >= col("nw")).as("r_ttr"))
        flags.groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("r_len") && col("r_wordlen") && col("r_stop") && col("r_ttr"),
            1L).otherwise(0L)).as("n_pass"),
          sum(col("r_len").cast("long")).as("n_len"),
          sum(col("r_wordlen").cast("long")).as("n_wordlen"),
          sum(col("r_stop").cast("long")).as("n_stop"),
          sum(col("r_ttr").cast("long")).as("n_ttr"))
      },
      Some("""
        WITH t AS (SELECT lang, regexp_extract_all(lower(text), '\S+') w FROM documents),
        m AS (SELECT lang,
            len(w) AS nw,
            CASE WHEN len(w) = 0 THEN 0
                 ELSE list_reduce(list_transform(w, x -> length(x)), (a, b) -> a + b) END AS sl,
            len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS ns,
            len(list_distinct(w)) AS nd
          FROM t),
        f AS (SELECT lang,
            (nw >= 20 AND nw <= 100000) AS r_len,
            (sl >= nw * 3 AND sl <= nw * 10) AS r_wordlen,
            (ns >= 2) AS r_stop,
            (nd * 5 >= nw) AS r_ttr
          FROM m)
        SELECT lang,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(CASE WHEN r_len AND r_wordlen AND r_stop AND r_ttr THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
          CAST(sum(CASE WHEN r_len THEN 1 ELSE 0 END) AS BIGINT) AS n_len,
          CAST(sum(CASE WHEN r_wordlen THEN 1 ELSE 0 END) AS BIGINT) AS n_wordlen,
          CAST(sum(CASE WHEN r_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
          CAST(sum(CASE WHEN r_ttr THEN 1 ELSE 0 END) AS BIGINT) AS n_ttr
        FROM f GROUP BY lang
      """)),

    // ---- q101: cross-document boilerplate 5-grams — the C4-style
    //      "same span appears in many documents" signal. Per-doc
    //      DISTINCT shingles (fused TokenShingles kernel) explode and
    //      shuffle once on the gram; document frequency is then a plain
    //      count. Top-20 by (df DESC, gram) is fully deterministic.
    //      At 100 TB this is the standard inverted-index shape: the
    //      shuffle key is the gram, per-doc distinct keeps a doc's
    //      repeated boilerplate from inflating its own count. ----
    GraftQuery(
      "q101_boilerplate_grams",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"),
            explode(TextFunctions.textShingles(col("text"), 5)).as("gram"))
          .groupBy(col("gram")).agg(count(lit(1)).as("n_docs"))
          .where(col("n_docs") >= 3)
          .orderBy(col("n_docs").desc, col("gram"))
          .limit(20),
      Some("""
        WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') toks FROM documents),
        g AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks) - 4),
                i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2], ' ', toks[i+3], ' ', toks[i+4]))) grams
              FROM t WHERE len(toks) >= 5),
        x AS (SELECT unnest(grams) AS gram, doc_id FROM g),
        c AS (SELECT gram, CAST(count(*) AS BIGINT) AS n_docs
              FROM x GROUP BY gram HAVING count(*) >= 3)
        SELECT gram, n_docs FROM c ORDER BY n_docs DESC, gram LIMIT 20
      """))
  )
}
