package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.core.Tables
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Text-analysis extensions, round 2 (q75-q79): TF-IDF term ranking,
  * edit-distance dedup, character-diversity quality scoring, and the
  * engine-portable SimHash — every query oracle-checked against DuckDB.
  *
  * Cross-engine exactness decisions:
  *  - TF-IDF uses a LOG-FREE idf, (N+1)/(df+1): libm `ln` is not
  *    bit-identical across engines, while integer ratios are. Ranking
  *    behavior is monotone-equivalent to the log form per term.
  *  - Char diversity is the Simpson index 1 − Σp², not Shannon entropy
  *    (again: no logs). Computed as an exact-integer numerator over an
  *    explicit alphabet, divided once.
  *  - SimHash token hashes are md5-derived (TextFunctions.hash60), so
  *    DuckDB replicates every majority vote bit-for-bit.
  */
object TextQueries2 {

  private val alphabet: Seq[Char] = ('a' to 'z') ++ ('0' to '9') :+ ' '

  /** DuckDB replica of the portable md5-family SimHash banding (every
    * majority-vote bit + the 4×15-bit band join — bit-for-bit). Shared
    * by q79 (verbatim) and q36 (with the xxhash-path agreement flag
    * appended via `extra`).
    */
  private[queries] def simhash60PairsOracleSql(extra: String = ""): String = s"""
    WITH tk AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
      FROM documents
      WHERE len(regexp_extract_all(lower(text), '\\S+')) > 0),
    h AS (
      SELECT doc_id,
        CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS hv
      FROM tk),
    votes AS (
      SELECT doc_id, j.j AS j,
        sum(CASE WHEN (hv >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      FROM h CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS j) j
      GROUP BY doc_id, j.j),
    sig AS (
      SELECT doc_id,
        CAST(sum(CASE WHEN vote > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS s
      FROM votes GROUP BY doc_id),
    banded AS (
      SELECT doc_id, s, b.b AS band, (s >> (15 * b.b)) & 32767 AS bsig
      FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) b),
    pairs AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
        CAST(bit_count(xor(x.s, y.s)) AS BIGINT) AS hamming
      FROM banded x JOIN banded y
        ON x.band = y.band AND x.bsig = y.bsig AND x.doc_id < y.doc_id)
    SELECT doc_a, doc_b, hamming$extra FROM pairs WHERE hamming <= 5
  """

  val queries: Seq[GraftQuery] = Seq(

    // ---- q75: TF-IDF top-3 terms per document (log-free portable
    //      scoring). df and N computed over the FULL corpus; ranking
    //      restricted to doc_id < 20 to bound output. The df join keys
    //      on the token (high cardinality — shuffle join), N broadcast
    //      as a 1-row aggregate. ----
    GraftQuery(
      "q75_tfidf_topk",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val tk = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        val tf = tk.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val scored = tf.join(df, Seq("tok")).join(broadcast(n))
          .select(col("doc_id"), col("tok"),
            ((col("tf") * (col("n_docs") + 1)).cast("double") / (col("df") + 1))
              .as("score"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("tok"))
        scored.where(col("doc_id") < 20)
          .withColumn("rank", row_number().over(w).cast("long"))
          .where(col("rank") <= 3)
      },
      Some("""
        WITH tk AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
          FROM documents),
        tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY doc_id, tok),
        df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
          SELECT doc_id, tf.tok,
            CAST(tf.tf * (n.n_docs + 1) AS DOUBLE) / (df.df + 1) AS score
          FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n)
        SELECT doc_id, tok, score,
          CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS BIGINT) AS rank
        FROM scored
        WHERE doc_id < 20
        QUALIFY rank <= 3
      """)),

    // ---- q76: edit-distance near-dup pairs, prefix-blocked. Both
    //      engines implement classic Levenshtein (integer, deterministic)
    //      so the distances hash-match exactly. ----
    GraftQuery(
      "q76_dedup_levenshtein",
      (s, d) =>
        Dedup.levenshteinBlocked(Tables.documents(s, d), "doc_id", "text",
          prefixLen = 20, maxDist = 30),
      Some("""
        WITH n AS (
          SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nm
          FROM documents)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS edit_dist
        FROM n a JOIN n b
          ON a.doc_id < b.doc_id
          AND substr(a.nm, 1, 20) = substr(b.nm, 1, 20)
          AND abs(len(a.nm) - len(b.nm)) <= 30
        WHERE levenshtein(a.nm, b.nm) <= 30
      """)),

    // ---- q77: character-diversity quality score (Simpson index over an
    //      explicit alphabet + an "other" bucket). Counts via the
    //      replace-trick (len minus len-without-char) — pure integer
    //      arithmetic until one final division, so both engines agree to
    //      the bit. ----
    GraftQuery(
      "q77_char_diversity",
      (s, d) => {
        val lowered = lower(col("text"))
        val counts = alphabet.map { ch =>
          (length(lowered) - length(expr(s"replace(lower(text), '$ch', '')")))
            .cast("long")
        }
        val total = length(lowered).cast("long")
        val known = counts.reduce(_ + _)
        val other = total - known
        val sumSq = counts.map(c => c * c).reduce(_ + _) + other * other
        Tables.documents(s, d)
          .where(length(col("text")) > 0 && col("doc_id") < 100)
          .select(col("doc_id"), total.as("n_chars"),
            ((total * total - sumSq).cast("double") / (total * total))
              .as("simpson"))
      },
      Some {
        val cnts = alphabet.map(ch =>
          s"CAST(len(t) - len(replace(t, '$ch', '')) AS BIGINT)").mkString(",\n            ")
        s"""
        WITH lowered AS (
          SELECT doc_id, lower(text) AS t FROM documents
          WHERE len(text) > 0 AND doc_id < 100),
        cts AS (
          SELECT doc_id, CAST(len(t) AS BIGINT) AS total,
            [$cnts] AS cs
          FROM lowered),
        agg AS (
          SELECT doc_id, total,
            list_reduce(cs, (a, b) -> a + b) AS known,
            list_reduce(list_transform(cs, c -> c * c), (a, b) -> a + b) AS sumsq_known
          FROM cts)
        SELECT doc_id, total AS n_chars,
          CAST(total * total - (sumsq_known + (total - known) * (total - known)) AS DOUBLE)
            / (total * total) AS simpson
        FROM agg
        """
      }),

    // ---- q78: engine-portable SimHash signatures — every majority-vote
    //      bit replicated by the oracle from the same md5-derived token
    //      hashes. ----
    GraftQuery(
      "q78_simhash_portable",
      (s, d) => Dedup.simhash60(Tables.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), col("simhash").as("sig")),
      Some("""
        WITH tk AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
          FROM documents
          WHERE len(regexp_extract_all(lower(text), '\S+')) > 0),
        h AS (
          SELECT doc_id,
            CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS hv
          FROM tk),
        votes AS (
          SELECT doc_id, j.j AS j,
            sum(CASE WHEN (hv >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS vote
          FROM h CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS j) j
          GROUP BY doc_id, j.j)
        SELECT doc_id,
          CAST(sum(CASE WHEN vote > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS sig
        FROM votes GROUP BY doc_id
      """)),

    // ---- q79: portable-SimHash near-dup pairs via 4×15-bit banding.
    //      The oracle replicates the BANDING (not a full O(N²) scan):
    //      banding is the scale path and can drop a ≤maxHamming pair
    //      whose bit diffs spread across all four bands, so replicating
    //      it is what makes the approximate result exactly checkable —
    //      same philosophy as q42's LSH oracle. ----
    GraftQuery(
      "q79_simhash_pairs",
      (s, d) => Dedup.simhash60Pairs(Tables.documents(s, d), "doc_id", "text",
        maxHamming = 5),
      Some(simhash60PairsOracleSql())),

    // ---- q83: benchmark decontamination — corpus docs sharing an
    //      8-gram with a (deterministic pseudo-)benchmark slice. The
    //      benchmark gram set broadcasts; the corpus never shuffles
    //      until the tiny per-doc count. ----
    GraftQuery(
      "q83_decontaminate",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.operators.Decontaminate.overlaps(
          corpus = docs.where(col("doc_id") % 10 =!= 3),
          bench = docs.where(col("doc_id") % 10 === 3),
          "doc_id", "text", n = 8)
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS tk FROM documents),
        grams AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            generate_series(1, len(tk) - 7),
            i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3],
                                tk[i+4], tk[i+5], tk[i+6], tk[i+7])))) AS gram
          FROM toks WHERE len(tk) >= 8),
        bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 3),
        corpus AS (SELECT doc_id, gram FROM grams WHERE doc_id % 10 <> 3)
        SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
        FROM corpus c JOIN bench b USING (gram)
        GROUP BY c.doc_id
      """)),

    // ---- q84: within-document repetition ratio — the fraction of
    //      3-gram slots occupied by repeats (a standard LLM-corpus
    //      quality signal: high ratio = boilerplate/spam). Integer
    //      counts, one final division. ----
    GraftQuery(
      "q84_repetition",
      (s, d) =>
        Tables.documents(s, d)
          .where(tokenCount(col("text")) >= 3) // cheap zero-alloc scan
          .select(col("doc_id"),
            (tokenCount(col("text")) - 2).as("n_grams"),
            size(textShingles(col("text"), 3)).cast("long").as("n_distinct"))
          .select(col("doc_id"), col("n_grams"), col("n_distinct"),
            ((col("n_grams") - col("n_distinct")).cast("double") / col("n_grams"))
              .as("rep_ratio")),
      Some("""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS tk FROM documents),
        g AS (
          SELECT doc_id,
            CAST(len(tk) - 2 AS BIGINT) AS n_grams,
            CAST(len(list_distinct(list_transform(generate_series(1, len(tk) - 2),
              i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])))) AS BIGINT) AS n_distinct
          FROM toks WHERE len(tk) >= 3)
        SELECT doc_id, n_grams, n_distinct,
          CAST(n_grams - n_distinct AS DOUBLE) / n_grams AS rep_ratio
        FROM g
      """)),

    // ---- q85: the end-to-end corpus-preparation pipeline — quality
    //      gate (length + repetition), exact dedup (keep min doc_id per
    //      fingerprint), benchmark decontamination — reporting the
    //      per-language funnel. Each stage is an operator exercised
    //      individually elsewhere (q31/q33/q83); this query is their
    //      COMPOSITION, the shape a real training-data job ships. ----
    GraftQuery(
      "q85_corpus_pipeline",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // stage 1: quality gate. The metrics are computed in a PROJECTION
        // and staged before filtering: with the shingle expression inline
        // in the Filter predicate, evaluation measured ~15× slower than
        // the identical expression in a Project (higher-order functions
        // are CodegenFallback; the filter path re-evaluates the inlined
        // alias per conjunct) — and the persist barrier stops Catalyst
        // from collapsing the projection back into the predicate.
        // the documents table is a single small parquet file → ONE scan
        // partition, which serializes this CPU-bound tokenize/shingle
        // stage on one core; a cheap repartition fans it across the
        // cluster (bytes are tiny, compute is not)
        // stage-1 history: with the interpreted regex/HOF shingle chain
        // this projection needed a checkpoint barrier (predicate pushdown
        // inlined the aliases and re-evaluated the chain per conjunct —
        // measured ~15× slower). The fused TokenCount/TokenShingles
        // kernels are cheap enough that the inlined single Filter is now
        // the FASTER shape (no checkpoint serialization of every doc),
        // so the barrier is gone and Catalyst is left alone.
        val metrics = graft.core.Partitioning.fanOut(docs)
          .select(col("doc_id"), col("lang"), col("text"),
            tokenCount(col("text")).as("nt"),
            size(textShingles(col("text"), 3)).cast("long").as("nd"))
          .withColumn("ng", col("nt") - 2) // derived, not a third tokenize
        val quality = metrics
          .where(col("nt") >= 10 && length(col("text")) <= 5000 &&
            (col("ng") - col("nd")).cast("double") / col("ng") < 0.5)
        // stage 2: exact dedup — keep the min doc_id per fingerprint.
        // Staged: the decontamination stage consumes survivors TWICE
        // (gram extraction + the final anti-join) and the chain above it
        // carries a tokenize + shingle + window — measured 9.2s unstaged
        // vs ~2s staged at sf0.1. The checkpoint RDD is persisted on
        // first compute, so the two consumer stages of the one terminal
        // job share it exactly like an eager persist+count, minus the
        // extra driver-synchronized actions. At cluster scale this stage
        // boundary is where a checkpoint/staging table goes.
        val survivors = quality
          .withColumn("fp", fingerprint(col("text")))
          .withColumn("keep",
            col("doc_id") === min(col("doc_id"))
              .over(org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
          .where(col("keep"))
          .select(col("doc_id"), col("lang"), col("text"))
          // (no repartition here: AQE byte-coalescing only narrows this
          // when the survivor set is small — exactly when the downstream
          // 8-gram explode is cheap; at corpus scale the window output
          // stays wide on its own. Measured locally: the extra exchange
          // cost more than the single-core explode it prevented.)
          .localCheckpoint(false) // two decontamination consumers below
        // stage 3: decontamination against the pseudo-benchmark slice
        val clean = graft.operators.Decontaminate.clean(
          survivors.where(col("doc_id") % 10 =!= 3),
          docs.where(col("doc_id") % 10 === 3),
          "doc_id", "text", n = 8)
        clean.groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, lang, text, regexp_extract_all(lower(text), '\S+') AS tk
          FROM documents),
        quality AS (
          SELECT * FROM toks
          WHERE len(tk) >= 10 AND len(text) <= 5000
            AND CAST(len(tk) - 2 - len(list_distinct(list_transform(
                  generate_series(1, len(tk) - 2),
                  i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])))) AS DOUBLE)
                / (len(tk) - 2) < 0.5),
        survivors AS (
          SELECT * FROM (
            SELECT doc_id, lang, text, tk,
              min(doc_id) OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS keep_id
            FROM quality)
          WHERE doc_id = keep_id),
        grams AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            generate_series(1, len(tk) - 7),
            i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3],
                                tk[i+4], tk[i+5], tk[i+6], tk[i+7])))) AS gram
          FROM toks WHERE len(tk) >= 8),
        bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 3),
        contaminated AS (
          SELECT DISTINCT g.doc_id
          FROM grams g JOIN bench b USING (gram)
          WHERE g.doc_id % 10 <> 3)
        SELECT lang, count(*) AS n_kept
        FROM survivors s
        WHERE s.doc_id % 10 <> 3
          AND NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = s.doc_id)
        GROUP BY lang
      """)),

    // ---- q86: deterministic train/val/test split — hash-threshold
    //      assignment (reproducible across engines and runs, unlike
    //      rand()-based randomSplit), stratification verified by the
    //      per-lang counts. 90/5/5 on the hash fraction. ----
    GraftQuery(
      "q86_train_split",
      (s, d) => {
        val h = hash60(col("doc_id").cast("string")).cast("double") / lit(math.pow(2.0, 60))
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            when(h < 0.9, "train").when(h < 0.95, "val").otherwise("test").as("split"))
          .groupBy(col("lang"), col("split"))
          .agg(count(lit(1)).as("n_docs"))
      },
      Some("""
        WITH h AS (
          SELECT doc_id, lang,
            CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE)
              / 2.0 ** 60 AS frac
          FROM documents)
        SELECT lang,
          CASE WHEN frac < 0.9 THEN 'train'
               WHEN frac < 0.95 THEN 'val'
               ELSE 'test' END AS split,
          count(*) AS n_docs
        FROM h GROUP BY lang, split
      """)),

    // ---- q87: sequence packing — assign documents (in id order) to
    //      fixed-capacity context windows by cumulative token count
    //      (the standard approximate-packing shape: bin = floor of the
    //      pre-doc running total / capacity). Packing is PER LANGUAGE
    //      shard: a global-order window funnels everything through one
    //      partition, while shard-local packing is both what a real
    //      pipeline does and embarrassingly parallel. ----
    GraftQuery(
      "q87_sequence_packing",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang"))
          .orderBy(col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val capacity = 4096L
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), tokenCount(col("text")).as("nt"))
          .withColumn("cum_before", coalesce(sum(col("nt")).over(w), lit(0L)))
          // explicit floor: `/` is fractional in both engines and DuckDB's
          // CAST(double AS BIGINT) ROUNDS where Spark truncates
          .withColumn("bin", floor(col("cum_before") / capacity).cast("long"))
          .groupBy(col("lang"), col("bin"))
          .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
      },
      Some("""
        WITH t AS (
          SELECT doc_id, lang,
            CAST(len(regexp_extract_all(lower(text), '\S+')) AS BIGINT) AS nt
          FROM documents),
        c AS (
          SELECT doc_id, lang, nt,
            COALESCE(sum(nt) OVER (PARTITION BY lang ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
          FROM t)
        SELECT lang, CAST(floor(cum_before / 4096) AS BIGINT) AS bin,
          count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens
        FROM c GROUP BY lang, bin
      """))
  )
}
