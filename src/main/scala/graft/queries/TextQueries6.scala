package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.core.Tables
import graft.functions.TextFunctions.{textShingles, tokenCount, tokens}

/** Text/corpus round 6 (round 8, second session): full-text retrieval
  * scoring (q160), asymmetric containment dedup (q161), vocabulary
  * out-of-coverage rate (q162), and winsorized length statistics
  * (q163). Every score is either pure integer (cross-multiplied ppm)
  * or a fixed-order expression over exact aggregates, so both engines
  * agree bit-for-bit — the established q140/q153 discipline.
  */
object TextQueries6 {

  val queries: Seq[GraftQuery] = Seq(

    // ---- q160: BM25-shaped multi-term retrieval over the corpus —
    //      the "find training docs about X" ranking a curation
    //      pipeline runs before manual review. Same shape as BM25
    //      (k1 = 1.2, b = 0.75) with the log-idf replaced by the raw
    //      Robertson–Spärck-Jones odds ratio (2(N−df)+1)/(2df+1) in
    //      exact integer ppm, so the whole score is integer
    //      cross-multiplied arithmetic and hash-matches the oracle:
    //      tf_ppm = 22e6·tf·sumdl / (10·sumdl·tf + 3·sumdl + 9·dl·N)
    //      (that is tf·(k1+1)/(tf + k1·(1−b + b·dl/avgdl)) with
    //      avgdl = sumdl/N cleared of fractions). Scale shape: one
    //      shuffle keyed by (doc, term) for tf; df (|terms| rows) and
    //      the global (N, sumdl) pair broadcast; the final ranking is
    //      a top-k window over docs matching ≥ 1 term. ----
    GraftQuery(
      "q160_bm25_topk",
      (s, d) => {
        val terms = Seq("join", "vector", "spark")
        val docs = Tables.documents(s, d)
        val dl = docs.select(col("doc_id"), tokenCount(col("text")).as("dl"))
        val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
        val tf = docs
          .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
          .where(col("tok").isin(terms: _*))
          .groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        val scored = tf
          .join(dl, Seq("doc_id"))
          .join(broadcast(df), Seq("tok"))
          .crossJoin(broadcast(stats))
          // decimal(38,0), not bigint: 22e6·tf·sumdl wraps int64 once
          // the corpus passes ~40 B tokens (DuckDB promotes to HUGEINT)
          .withColumn("term_score", expr("""cast(
              (1000000 * (2 * (n - df) + 1) div (2 * df + 1))
                * (cast(22000000 as decimal(38,0)) * tf * sumdl
                   div (10 * cast(sumdl as decimal(38,0)) * tf + 3 * sumdl + 9 * dl * n))
                div 1000000 as bigint)"""))
        val agg = scored.groupBy(col("doc_id"))
          .agg(sum(col("term_score")).as("score_ppm"))
        // distributed top-k (TakeOrderedAndProject), NOT a global rank
        // window — every term-matching doc would land in one partition.
        // The rank window runs over the 10 survivors only.
        val top = agg.orderBy(col("score_ppm").desc, col("doc_id")).limit(10)
        top.withColumn("rank",
          row_number().over(Window.orderBy(col("score_ppm").desc, col("doc_id")))
            .cast("long"))
      },
      Some("""
        WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') toks
                    FROM documents),
        dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tk),
        stats AS (SELECT CAST(count(*) AS BIGINT) n, CAST(sum(dl) AS BIGINT) sumdl
                  FROM dl),
        tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) tf
               FROM (SELECT doc_id, unnest(toks) AS tok FROM tk)
               WHERE tok IN ('join', 'vector', 'spark')
               GROUP BY doc_id, tok),
        df AS (SELECT tok, CAST(count(*) AS BIGINT) df FROM tf GROUP BY tok),
        sc AS (SELECT t.doc_id,
            CAST((1000000 * (2 * (s.n - f.df) + 1) // (2 * f.df + 1))
              * (CAST(22000000 AS HUGEINT) * t.tf * s.sumdl
                 // (10 * CAST(s.sumdl AS HUGEINT) * t.tf + 3 * s.sumdl + 9 * l.dl * s.n))
              // 1000000 AS BIGINT) AS term_score
          FROM tf t JOIN dl l USING (doc_id)
          CROSS JOIN stats s JOIN df f ON f.tok = t.tok),
        agg AS (SELECT doc_id, CAST(sum(term_score) AS BIGINT) AS score_ppm
                FROM sc GROUP BY doc_id)
        SELECT doc_id, score_ppm, rank FROM (
          SELECT doc_id, score_ppm,
            CAST(row_number() OVER (ORDER BY score_ppm DESC, doc_id) AS BIGINT) AS rank
          FROM agg) t
        WHERE rank <= 10
      """)),

    // ---- q161: asymmetric containment dedup — "is most of doc A
    //      inside doc B?" — catches the quote/expansion/subset cases
    //      symmetric Jaccard (q35) misses (a short doc fully quoted in
    //      a long one has low Jaccard but containment 1.0). Word
    //      5-gram shingles; grams appearing in > 50 docs are dropped
    //      from BOTH the intersection and the denominator (the
    //      stop-gram cap — at scale it bounds candidate pairs by
    //      cap²·|hot grams| instead of N², the same df-pruning bound
    //      the blocked-Jaccard scaladoc names). Candidate expansion
    //      rides the q35 gram-group idiom: one shuffle on the gram,
    //      i<j combos expanded in place, one shuffle on the pair —
    //      never a self-join. Emitted per ORDERED pair (containment is
    //      asymmetric) where inter/|S_A| ≥ 0.5 and |S_A| ≥ 5. ----
    GraftQuery(
      "q161_containment_dedup",
      (s, d) => {
        val cap = 50
        val sh = Tables.documents(s, d)
          .select(col("doc_id"), explode(textShingles(col("text"), 5)).as("g"))
        val gd = sh.groupBy(col("g"))
          .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
          .where(size(col("ds")) <= cap)
        // per-doc eligible-gram counts WITHOUT re-running the heavy
        // collect_list shuffle: the stop-grams (df > cap) are a tiny
        // set by construction, so a count-only aggregate finds them
        // (map-side combine — never a doc list) and a broadcast
        // anti-join subtracts them from each doc's distinct shingles
        val hot = sh.groupBy(col("g")).agg(count(lit(1)).as("_df"))
          .where(col("_df") > cap).select(col("g"))
        val elig = sh.join(broadcast(hot), Seq("g"), "left_anti")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_elig"))
        val combos = flatten(transform(sequence(lit(0), size(col("ds")) - 2), i =>
          transform(sequence(i + 1, size(col("ds")) - 1), j =>
            struct(element_at(col("ds"), i + 1).as("a"),
              element_at(col("ds"), j + 1).as("b")))))
        val inter = gd.where(size(col("ds")) > 1)
          .select(explode(combos).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(count(lit(1)).as("n_inter"))
        // explode both orientations from ONE evaluation of `inter`: the
        // unionAll-of-two-selects it replaces embedded the whole
        // shingle-explode → collect_list → combo-expand → pair-agg
        // lineage twice (q181's double-pipeline pattern)
        val ordered = inter
          .select(explode(array(
              struct(col("a").as("id_a"), col("b").as("id_b")),
              struct(col("b").as("id_a"), col("a").as("id_b")))).as("p"),
            col("n_inter"))
          .select(col("p.id_a"), col("p.id_b"), col("n_inter"))
        ordered
          .join(elig.withColumnRenamed("doc_id", "id_a")
            .withColumnRenamed("n_elig", "n_a"), Seq("id_a"))
          .where(col("n_inter") * 2 >= col("n_a") && col("n_a") >= 5)
          .select(col("id_a"), col("id_b"), col("n_inter"), col("n_a"))
      },
      Some("""
        WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') toks
                   FROM documents),
        s AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks) - 4),
                i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2], ' ', toks[i+3], ' ', toks[i+4]))) sh
              FROM t WHERE len(toks) >= 5),
        g AS (SELECT doc_id, unnest(sh) AS gram FROM s),
        gd AS (SELECT gram FROM g GROUP BY gram HAVING count(*) <= 50),
        keepg AS (SELECT g.gram, g.doc_id FROM g JOIN gd USING (gram)),
        elig AS (SELECT doc_id, CAST(count(*) AS BIGINT) n_elig
                 FROM keepg GROUP BY doc_id),
        inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b,
                    CAST(count(*) AS BIGINT) n_inter
                  FROM keepg x JOIN keepg y
                    ON x.gram = y.gram AND x.doc_id <> y.doc_id
                  GROUP BY x.doc_id, y.doc_id)
        SELECT i.id_a, i.id_b, i.n_inter, e.n_elig AS n_a
        FROM inter i JOIN elig e ON e.doc_id = i.id_a
        WHERE 2 * i.n_inter >= e.n_elig AND e.n_elig >= 5
      """)),

    // ---- q162: out-of-vocabulary rate under a frequency-built vocab —
    //      the tokenizer-coverage check a pipeline runs before
    //      committing to a vocabulary: build the top-20 token vocab
    //      (global count desc, token asc — deterministic at the
    //      boundary), then per source measure what fraction of token
    //      OCCURRENCES falls outside it, in integer ppm. Scale shape:
    //      the vocab is a top-k over the token-count aggregate
    //      (broadcast back); per-source tallies are one combiner-
    //      friendly shuffle on (source, in-vocab flag). ----
    GraftQuery(
      "q162_oov_rate",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("source"), explode(tokens(col("text"))).as("tok"))
        // distributed top-k over the token-type aggregate (a corpus has
        // millions of types at scale — no global rank window)
        val vocab = tok.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("tok")).limit(20).select(col("tok"))
        tok.join(broadcast(vocab).withColumn("_in", lit(1L)), Seq("tok"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("total_toks"),
            sum(when(col("_in").isNull, 1L).otherwise(0L)).as("oov_toks"))
          .withColumn("oov_ppm",
            expr("cast(1000000 * oov_toks div total_toks as bigint)"))
      },
      Some("""
        WITH tok AS (SELECT source, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
                     FROM documents),
        vocab AS (SELECT tok FROM (
            SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok) AS r
            FROM tok GROUP BY tok) t
          WHERE r <= 20)
        SELECT source, CAST(count(*) AS BIGINT) AS total_toks,
          CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_toks,
          CAST(1000000 * sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) // count(*) AS BIGINT)
            AS oov_ppm
        FROM tok LEFT JOIN vocab v USING (tok)
        GROUP BY source
      """)),

    // ---- q163: winsorized length statistics per source — the
    //      outlier-robust clamp a quality pipeline applies before
    //      length-based mixing (a single 100 MB doc must not dominate
    //      a source's token budget). Bounds are the interpolated
    //      p05/p95 from the exact Quantiles grid (quantile_cont-equal
    //      interpolation on every path; percentile_approx is the
    //      documented scale path, q150). The winsorized sum is
    //      a FIXED-ORDER expression over exact parts —
    //      sum_within + n_below·p05 + n_above·p95 — never a float
    //      aggregation, so it is bit-stable on both engines. ----
    GraftQuery(
      "q163_winsorized_lengths",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // pinned agg path: 4 sources — no need for the dispatcher's
        // extra counting scan of the documents table
        val b = graft.operators.Quantiles
          .gridPercentiles(docs, Seq("source"), "n_chars", Seq(0.05, 0.95),
            aggGroupLimit = Long.MaxValue)
          .select(col("source"), col("n"),
            col("pct")(0).as("p05"), col("pct")(1).as("p95"))
        docs.join(broadcast(b), Seq("source"))
          .groupBy(col("source"))
          .agg(max(col("n")).as("n"), max(col("p05")).as("p05"),
            max(col("p95")).as("p95"),
            sum(when(col("n_chars") < col("p05"), 1L).otherwise(0L)).as("n_below"),
            sum(when(col("n_chars") > col("p95"), 1L).otherwise(0L)).as("n_above"),
            sum(when(col("n_chars") >= col("p05") && col("n_chars") <= col("p95"),
              col("n_chars")).otherwise(0L)).as("sum_within"))
          .withColumn("winsor_sum",
            col("sum_within").cast("double")
              + col("n_below") * col("p05") + col("n_above") * col("p95"))
          .select(col("source"), col("n"), col("p05"), col("p95"),
            col("n_below"), col("n_above"), col("winsor_sum"))
      },
      Some("""
        WITH b AS (SELECT source, CAST(count(*) AS BIGINT) n,
                     quantile_cont(n_chars, 0.05) AS p05,
                     quantile_cont(n_chars, 0.95) AS p95
                   FROM documents GROUP BY source),
        j AS (SELECT d.source, d.n_chars, b.n, b.p05, b.p95
              FROM documents d JOIN b USING (source)),
        a AS (SELECT source, max(n) AS n, max(p05) AS p05, max(p95) AS p95,
                CAST(sum(CASE WHEN n_chars < p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
                CAST(sum(CASE WHEN n_chars > p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
                CAST(sum(CASE WHEN n_chars >= p05 AND n_chars <= p95
                     THEN n_chars ELSE 0 END) AS BIGINT) AS sum_within
              FROM j GROUP BY source)
        SELECT source, n, p05, p95, n_below, n_above,
          CAST(sum_within AS DOUBLE) + n_below * p05 + n_above * p95 AS winsor_sum
        FROM a
      """)),

    // ---- q165: PMI collocations — the top bigrams whose tokens
    //      co-occur far above chance, ranked by the PMI log-argument
    //      P(x,y)/(P(x)P(y)) = c_xy·N_tok² / (N_bi·c_x·c_y) in exact
    //      integer ppm (PMI's log is monotone, so ranking by the
    //      argument IS ranking by PMI — and the score stays pure
    //      integer). The collocation miner a tokenizer/vocab pipeline
    //      runs to find multi-word units worth merging. Min support
    //      c_xy ≥ 5 (standard PMI low-count guard). Scale shape: one
    //      shuffle per n-gram order (unigram, bigram counts), two
    //      keyed joins bigram→unigram, global scalars broadcast,
    //      distributed top-k. ----
    GraftQuery(
      "q165_pmi_collocations",
      (s, d) => {
        val tk = Tables.documents(s, d).select(tokens(col("text")).as("tk"))
        val stats = tk.agg(
          sum(size(col("tk"))).cast("long").as("ntok"),
          sum(greatest(size(col("tk")) - 1, lit(0))).cast("long").as("nbi"))
        val uni = tk.select(explode(col("tk")).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        val bi = tk.where(size(col("tk")) >= 2)
          // element_at is 1-based on both engines; sequence guard above
          // matters — Spark's sequence(1, 0) counts DOWN, not empty
          .select(explode(expr(
            """transform(sequence(1, size(tk) - 1),
               i -> struct(element_at(tk, i) as x, element_at(tk, i + 1) as y))""")).as("b"))
          .groupBy(col("b.x").as("x"), col("b.y").as("y"))
          .agg(count(lit(1)).as("cxy"))
          .where(col("cxy") >= 5)
        val scored = bi
          .join(uni.select(col("tok").as("x"), col("c").as("cx")), Seq("x"))
          .join(uni.select(col("tok").as("y"), col("c").as("cy")), Seq("y"))
          .crossJoin(broadcast(stats))
          // decimal(38,0): c_xy·N_tok²·1e6 passes int64 at ~10 B tokens
          .withColumn("pmi_ppm", expr("""cast(
              cast(cxy as decimal(38,0)) * ntok * ntok * 1000000
                div (cast(nbi as decimal(38,0)) * cx * cy) as bigint)"""))
        val top = scored.orderBy(col("pmi_ppm").desc, col("x"), col("y")).limit(20)
        top.withColumn("rank", row_number().over(
            Window.orderBy(col("pmi_ppm").desc, col("x"), col("y"))).cast("long"))
          .select(col("x"), col("y"), col("cxy"), col("pmi_ppm"), col("rank"))
      },
      Some("""
        WITH tk AS (SELECT regexp_extract_all(lower(text), '\S+') toks FROM documents),
        st AS (SELECT CAST(sum(len(toks)) AS BIGINT) ntok,
                 CAST(sum(greatest(len(toks) - 1, 0)) AS BIGINT) nbi FROM tk),
        uni AS (SELECT tok, CAST(count(*) AS BIGINT) c
                FROM (SELECT unnest(toks) AS tok FROM tk) GROUP BY tok),
        bi AS (SELECT pr[1] AS x, pr[2] AS y, CAST(count(*) AS BIGINT) cxy
               FROM (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                       i -> [toks[i], toks[i+1]])) AS pr
                     FROM tk WHERE len(toks) >= 2)
               GROUP BY pr[1], pr[2]
               HAVING count(*) >= 5),
        sc AS (SELECT b.x, b.y, b.cxy,
                 CAST(CAST(b.cxy AS HUGEINT) * s.ntok * s.ntok * 1000000
                   // (CAST(s.nbi AS HUGEINT) * ux.c * uy.c) AS BIGINT) AS pmi_ppm
               FROM bi b JOIN uni ux ON ux.tok = b.x
                         JOIN uni uy ON uy.tok = b.y
               CROSS JOIN st s)
        SELECT x, y, cxy, pmi_ppm, rank FROM (
          SELECT x, y, cxy, pmi_ppm,
            CAST(row_number() OVER (ORDER BY pmi_ppm DESC, x, y) AS BIGINT) AS rank
          FROM sc) t
        WHERE rank <= 20
      """)),

    // ---- q168: dedup threshold operating curve — how many near-dup
    //      pairs each Jaccard decile holds, from one pass of the
    //      blocked bigram kernel at a low floor (0.05). The sweep a
    //      pipeline owner reads before committing to a dedup
    //      threshold: "0.8 removes 40 pairs, 0.5 removes 600 — which
    //      do we mean?" — without re-running the pair kernel per
    //      candidate threshold. Deciles are exact integers
    //      (10·n_inter div n_union ∈ 0..10); the kernel is the q35
    //      gram-group design, so the sweep costs one extra hash
    //      aggregate over the pair set. ----
    GraftQuery(
      "q168_dedup_threshold_sweep",
      (s, d) => {
        graft.operators.Dedup.ngramJaccardBlocked(
            Tables.documents(s, d), "doc_id", "text", "source", n = 2, tau = 0.05)
          .groupBy(expr("cast(10 * n_inter div n_union as bigint)").as("decile"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("n_inter")).as("sum_inter"),
            sum(col("n_union")).as("sum_union"))
      },
      Some("""
        WITH t AS (SELECT doc_id, source, regexp_extract_all(lower(text), '\S+') toks
                   FROM documents),
        s AS (SELECT doc_id, source, list_distinct(list_transform(generate_series(1, len(toks)-1),
                i -> concat(toks[i], ' ', toks[i+1]))) sh
              FROM t WHERE len(toks) >= 2),
        p AS (SELECT CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT) AS n_inter,
                CAST(len(list_distinct(list_concat(x.sh, y.sh))) AS BIGINT) AS n_union
              FROM s x JOIN s y ON x.source = y.source AND x.doc_id < y.doc_id
              WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                  / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.05)
        SELECT CAST(10 * n_inter // n_union AS BIGINT) AS decile,
          CAST(count(*) AS BIGINT) AS n_pairs,
          CAST(sum(n_inter) AS BIGINT) AS sum_inter,
          CAST(sum(n_union) AS BIGINT) AS sum_union
        FROM p GROUP BY 1
      """))
  )
}
