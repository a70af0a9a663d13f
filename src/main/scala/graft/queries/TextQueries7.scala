package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.core.Tables
import graft.functions.TextFunctions.tokens

/** Text/corpus round 7 (round 8, third session): Zipf coverage curve
  * (q174), size-proportional systematic sampling (q175), and dominant-
  * language-per-source mode report (q179). All integer arithmetic
  * (counts, cumulative sums, ppm shares by truncating division) — the
  * established hash-match discipline.
  */
object TextQueries7 {

  val queries: Seq[GraftQuery] = Seq(

    // ---- q174: Zipf coverage curve — what share of all tokens the
    //      top-1/10/100/1000 terms cover (the "how head-heavy is this
    //      corpus" curation diagnostic; a boilerplate-heavy crawl
    //      shows extreme head mass). Scale shape: one map-side-
    //      combined groupBy for term counts (checkpointed once, read
    //      by both the total and the top-k), a DISTRIBUTED top-1000
    //      (TakeOrdered — no global sort of the vocabulary), then the
    //      rank/cumsum window runs on just those 1000 rows in one
    //      partition. Coverage is ppm by truncating division. ----
    GraftQuery(
      "q174_zipf_coverage",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(explode(tokens(col("text"))).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("n"))
          .localCheckpoint(true)
        val total = counts.agg(sum(col("n")).as("total"))
        val top = counts.orderBy(col("n").desc, col("tok")).limit(1000)
        val ord = Window.orderBy(col("n").desc, col("tok"))
        top
          .withColumn("rank", row_number().over(ord).cast("long"))
          .withColumn("cum",
            sum(col("n")).over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          // curve anchors adapted to the fixture vocabulary (31
          // distinct tokens — synthetic text); at web-corpus scale
          // these would be 1/10/100/1000 against the same top-k plan
          .where(col("rank").isin(1L, 3L, 10L, 30L))
          .crossJoin(broadcast(total))
          .select(col("rank"), col("tok").as("term"), col("n"), col("cum"),
            expr("cast(1000000 * cum div total as bigint)").as("coverage_ppm"))
      },
      Some("""
        WITH t AS (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS tok
                   FROM documents),
        c AS (SELECT tok, CAST(count(*) AS BIGINT) n FROM t GROUP BY tok),
        tot AS (SELECT sum(n) total FROM c),
        r AS (SELECT tok, n,
                row_number() OVER (ORDER BY n DESC, tok) rank,
                sum(n) OVER (ORDER BY n DESC, tok ROWS UNBOUNDED PRECEDING) cum
              FROM c)
        SELECT CAST(rank AS BIGINT) AS rank, tok AS term, n,
          CAST(cum AS BIGINT) AS cum,
          CAST(1000000 * cum // total AS BIGINT) AS coverage_ppm
        FROM r, tot WHERE rank IN (1, 3, 10, 30)
      """)),

    // ---- q175: size-proportional systematic sampling — ~50 docs
    //      picked where the cumulative character count (in doc_id
    //      order) crosses a stride boundary, so selection probability
    //      is proportional to length with zero randomness (the
    //      deterministic counterpart to weighted reservoir sampling;
    //      rerunnable, auditable, and integer-exact). Scale shape: the
    //      global running sum is a two-phase distributed prefix sum —
    //      per-bucket subtotals (one small aggregate), bucket offsets
    //      via a window over the BUCKET list (1024× smaller than the
    //      data; the only single-partition step), broadcast back, and
    //      the intra-bucket running sum partitioned by bucket. No
    //      global sort of the documents table. ----
    GraftQuery(
      "q175_systematic_sample",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"))
          .withColumn("bkt", expr("doc_id div 1024"))
        val b = docs.groupBy(col("bkt")).agg(sum(col("n_chars")).as("bsum"))
        val wOff = Window.orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wTot = Window.orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val off = b.select(col("bkt"),
          coalesce(sum(col("bsum")).over(wOff), lit(0L)).as("off"),
          sum(col("bsum")).over(wTot).as("total"))
        val wIn = Window.partitionBy(col("bkt")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        docs.join(broadcast(off), Seq("bkt"))
          .withColumn("cum", sum(col("n_chars")).over(wIn) + col("off"))
          .withColumn("step", greatest(expr("total div 50"), lit(1L)))
          .where(expr("cum div step > (cum - n_chars) div step"))
          .select(col("doc_id"), col("n_chars"), col("cum"))
      },
      Some("""
        WITH c AS (SELECT doc_id, n_chars,
                     sum(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) cum,
                     sum(n_chars) OVER () total
                   FROM documents)
        SELECT doc_id, n_chars, CAST(cum AS BIGINT) AS cum
        FROM c
        WHERE cum // greatest(total // 50, 1) > (cum - n_chars) // greatest(total // 50, 1)
      """)),

    // ---- q179: dominant language per source — the per-group mode
    //      with a deterministic tie-break (count desc, then language
    //      name), plus its corpus share in ppm. One map-side-combined
    //      groupBy; the per-source window runs over |sources|×|langs|
    //      rows, not the corpus. ----
    GraftQuery(
      "q179_dominant_lang",
      (s, d) => {
        val c = Tables.documents(s, d)
          .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("source")).orderBy(col("n").desc, col("lang"))
        val t = Window.partitionBy(col("source"))
        c.withColumn("r", row_number().over(w))
          .withColumn("tot", sum(col("n")).over(t))
          .where(col("r") === 1)
          .select(col("source"), col("lang").as("dominant_lang"), col("n"),
            expr("cast(1000000 * n div tot as bigint)").as("share_ppm"))
      },
      Some("""
        WITH c AS (SELECT source, lang, CAST(count(*) AS BIGINT) n
                   FROM documents GROUP BY source, lang),
        r AS (SELECT source, lang, n,
                row_number() OVER (PARTITION BY source ORDER BY n DESC, lang) r,
                sum(n) OVER (PARTITION BY source) tot
              FROM c)
        SELECT source, lang AS dominant_lang, n,
          CAST(1000000 * n // tot AS BIGINT) AS share_ppm
        FROM r WHERE r = 1
      """)),

    // ---- q185: duplicate-cluster size histogram — the "how
    //      duplicated is this corpus" readout that sizes a dedup pass
    //      before running it (group_size 1 = unique docs; the tail is
    //      the boilerplate). Spark groups by md5(text) so the
    //      shuffle carries 16-byte keys, not document bodies — the
    //      100 TB shape; the oracle groups by the text itself
    //      (identical counts unless md5 collides, which the oracle
    //      comparison would catch). Row count is bounded by the max
    //      cluster size. ----
    GraftQuery(
      "q185_dup_size_histogram",
      (s, d) => {
        val sizes = Tables.documents(s, d)
          .groupBy(md5(col("text")).as("h"))
          .agg(count(lit(1)).as("group_size"))
        sizes.groupBy(col("group_size"))
          .agg(count(lit(1)).as("n_groups"))
          .select(col("group_size"), col("n_groups"),
            (col("group_size") * col("n_groups")).as("n_docs"))
      },
      Some("""
        WITH g AS (SELECT text, CAST(count(*) AS BIGINT) group_size
                   FROM documents GROUP BY text)
        SELECT group_size, CAST(count(*) AS BIGINT) AS n_groups,
          CAST(group_size * count(*) AS BIGINT) AS n_docs
        FROM g GROUP BY group_size
      """)),

    // ---- q189: quantile-normalized quality blending — each doc's
    //      quality (n_chars proxy) mapped to its WITHIN-SOURCE
    //      percentile rank, then bucketed into global deciles. This is
    //      how heterogeneous sources mix without one source's scale
    //      dominating the blend (rank normalization is the
    //      distribution-free fix). Rank ppm is exact integer
    //      (row_number ties broken by doc_id both engines); one
    //      window pass partitioned BY SOURCE — no global sort. ----
    GraftQuery(
      "q189_quantile_normalized",
      (s, d) => {
        val w = Window.partitionBy(col("source"))
          .orderBy(col("n_chars"), col("doc_id"))
        val t = Window.partitionBy(col("source"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .withColumn("r", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(t))
          .withColumn("pct_ppm",
            expr("cast(1000000 * (r - 1) div greatest(n - 1, 1) as bigint)"))
          .withColumn("decile", least(expr("pct_ppm div 100000"), lit(9L)))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("source")).as("n_sources"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"))
      },
      Some("""
        WITH r AS (
          SELECT doc_id, source, n_chars,
            CAST(row_number() OVER (PARTITION BY source
              ORDER BY n_chars, doc_id) AS BIGINT) r,
            CAST(count(*) OVER (PARTITION BY source) AS BIGINT) n
          FROM documents),
        p AS (
          SELECT source, n_chars,
            least(CAST(1000000 * (r - 1) // greatest(n - 1, 1) AS BIGINT)
              // 100000, 9) AS decile
          FROM r)
        SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
          min(n_chars) AS min_chars, max(n_chars) AS max_chars
        FROM p GROUP BY decile
      """)),

    // ---- q200: per-source corpus datasheet — the one-page "datasheet
    //      for datasets" row a curation pipeline publishes per source:
    //      volume, exact-duplicate rate, language breadth and
    //      dominant-language share, and length stats, all exact
    //      integers in one pass over the documents table (dup counts
    //      via 16-byte md5 group keys, the q185 shuffle discipline).
    //      Composes the q33/q179/q163 kernels into the report users
    //      actually consume. ----
    GraftQuery(
      "q200_source_datasheet",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val base = docs.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(md5(col("text"))).as("n_unique"),
            countDistinct(col("lang")).as("n_langs"),
            sum(col("n_chars")).as("total_chars"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"))
        val domShare = {
          val c = docs.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n"))
          val w = Window.partitionBy(col("source")).orderBy(col("n").desc, col("lang"))
          c.withColumn("r", row_number().over(w)).where(col("r") === 1)
            .select(col("source"), col("n").as("n_dominant"))
        }
        base.join(broadcast(domShare), Seq("source"))
          .select(col("source"), col("n_docs"), col("n_unique"),
            expr("cast(1000000 * (n_docs - n_unique) div n_docs as bigint)")
              .as("dup_ppm"),
            col("n_langs"),
            expr("cast(1000000 * n_dominant div n_docs as bigint)")
              .as("dominant_lang_ppm"),
            expr("cast(total_chars div n_docs as bigint)").as("mean_chars"),
            col("min_chars"), col("max_chars"))
      },
      Some("""
        WITH base AS (
          SELECT source, CAST(count(*) AS BIGINT) n_docs,
            CAST(count(DISTINCT md5(text)) AS BIGINT) n_unique,
            CAST(count(DISTINCT lang) AS BIGINT) n_langs,
            sum(n_chars) total_chars,
            min(n_chars) min_chars, max(n_chars) max_chars
          FROM documents GROUP BY source),
        dom AS (
          SELECT source, n AS n_dominant FROM (
            SELECT source, lang, CAST(count(*) AS BIGINT) n,
              row_number() OVER (PARTITION BY source ORDER BY count(*) DESC, lang) r
            FROM documents GROUP BY source, lang) t
          WHERE r = 1)
        SELECT b.source, b.n_docs, b.n_unique,
          CAST(1000000 * (b.n_docs - b.n_unique) // b.n_docs AS BIGINT) AS dup_ppm,
          b.n_langs,
          CAST(1000000 * d.n_dominant // b.n_docs AS BIGINT) AS dominant_lang_ppm,
          CAST(b.total_chars // b.n_docs AS BIGINT) AS mean_chars,
          b.min_chars, b.max_chars
        FROM base b JOIN dom d USING (source)
      """))
  )
}
