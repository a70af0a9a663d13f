package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.core.Tables
import graft.functions.Exact.dec2
import graft.functions.Sketches
import graft.functions.TextFunctions.hash60

/** Round-5 additions: portable sketch operators under the full oracle
  * gate. Like q74's KMV sketch, the hashing is md5-derived and computed
  * OUTSIDE the aggregate, so DuckDB rebuilds the identical sketch and
  * the approximate answers hash-match bit-for-bit.
  */
object Relational6 {

  val queries: Seq[GraftQuery] = Seq(

    // ---- q118: Count-Min frequency estimation — build one CMS over
    //      every lineitem's part key (depth 4 × width 1024 bucket
    //      sums, one pass, mergeable across partitions), then probe 10
    //      part keys. The estimate is min-over-rows of the probed
    //      bucket — an overestimate by construction; the oracle
    //      rebuilds the exact sketch with GROUP BYs over the same
    //      md5-bit-slice hashes, so even the collision error matches
    //      bit-for-bit. true_n rides along to document the one-sided
    //      error in the output itself. ----
    GraftQuery(
      "q118_cms_freq",
      (s, d) => {
        val depth = 4; val wBits = 10
        val li = Tables.lineitem(s, d)
        val sk = li.agg(Sketches.countMin(
          hash60(col("l_partkey").cast("string")), depth, wBits).as("sk"))
        val truth = li.where(col("l_partkey") <= 10)
          .groupBy(col("l_partkey").as("part"))
          .agg(count(lit(1)).as("true_n"))
        truth.crossJoin(broadcast(sk))
          .select(col("part"),
            Sketches.countMinEstimate(col("sk"),
              hash60(col("part").cast("string")), depth, wBits).as("est_n"),
            col("true_n"))
      },
      Some("""
        WITH h AS (
          SELECT CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
          FROM lineitem),
        rows_i AS (SELECT unnest(generate_series(0, 3)) AS i),
        buckets AS (
          SELECT i, (hv >> (10 * i)) & 1023 AS b, count(*) AS c
          FROM h CROSS JOIN rows_i
          GROUP BY 1, 2),
        truth AS (
          SELECT l_partkey AS part, count(*) AS true_n
          FROM lineitem WHERE l_partkey <= 10 GROUP BY 1),
        probe AS (
          SELECT part, true_n,
            CAST(concat('0x', substr(md5(CAST(part AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
          FROM truth),
        est AS (
          SELECT p.part, p.true_n, min(coalesce(b.c, 0)) AS est_n
          FROM probe p
          CROSS JOIN rows_i r
          LEFT JOIN buckets b ON b.i = r.i AND b.b = (p.hv >> (10 * r.i)) & 1023
          GROUP BY 1, 2)
        SELECT part, CAST(est_n AS BIGINT) AS est_n, CAST(true_n AS BIGINT) AS true_n
        FROM est
      """)),

    // ---- q119: Bloom-filter membership — build one filter over the
    //      custkeys with an URGENT 1997 order (3 bit-slice hashes into
    //      2^16 bits; the filtered set leaves plenty of non-member
    //      probes at every SF), probe EVERY customer, and cross-tab the
    //      filter's answer against the exact semi-join truth. No false
    //      negatives by construction — the (false, true) cell must be
    //      absent; false positives are data-dependent but the oracle
    //      computes the IDENTICAL bitset, so even they hash-match.
    //      This is the broadcast prefilter pattern for 100 TB
    //      anti-joins: ship the KB-scale filter, not the key set. ----
    GraftQuery(
      "q119_bloom_membership",
      (s, d) => {
        val k = 3; val b = 16
        val urgent = Tables.orders(s, d)
          .where(col("o_orderpriority") === "1-URGENT" &&
            col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01")))
        val flt = urgent
          .select(hash60(col("o_custkey").cast("string")).as("h"))
          .agg(Sketches.bloom(col("h"), k, b).as("bf"))
        val members = urgent.select(col("o_custkey")).distinct()
        Tables.customer(s, d).select(col("c_custkey"))
          .crossJoin(broadcast(flt))
          .withColumn("might", Sketches.bloomMightContain(
            col("bf"), hash60(col("c_custkey").cast("string")), k, b))
          .join(members, col("c_custkey") === col("o_custkey"), "left")
          .select(col("might"), col("o_custkey").isNotNull.as("actual"))
          .groupBy(col("might"), col("actual"))
          .agg(count(lit(1)).as("n_cust"))
      },
      Some("""
        WITH urgent AS (
          SELECT o_custkey FROM orders
          WHERE o_orderpriority = '1-URGENT'
            AND o_orderdate >= TIMESTAMP '1997-01-01'
            AND o_orderdate < TIMESTAMP '1998-01-01'),
        hs AS (
          SELECT DISTINCT
            CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
          FROM urgent),
        rows_i AS (SELECT unnest(generate_series(0, 2)) AS i),
        pos AS (
          SELECT DISTINCT (hv >> (16 * i)) & 65535 AS p
          FROM hs CROSS JOIN rows_i),
        probe AS (
          SELECT c_custkey,
            CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
          FROM customer),
        verdict AS (
          SELECT pr.c_custkey,
            bool_and(((pr.hv >> (16 * r.i)) & 65535) IN (SELECT p FROM pos)) AS might
          FROM probe pr CROSS JOIN rows_i r
          GROUP BY 1),
        truth AS (SELECT DISTINCT o_custkey FROM urgent)
        SELECT v.might, t.o_custkey IS NOT NULL AS actual,
          CAST(count(*) AS BIGINT) AS n_cust
        FROM verdict v LEFT JOIN truth t ON t.o_custkey = v.c_custkey
        GROUP BY 1, 2
      """)),

    // ---- q120: one BPE training step — count adjacent CHARACTER pairs
    //      inside words across the corpus and rank the merge
    //      candidates. This is the inner loop of byte-pair-encoding
    //      vocabulary training (the real thing, not the q56 tokenizer
    //      which APPLIES a vocab): each iteration merges the top pair
    //      and recounts. One explode→substr→groupBy pipeline — a
    //      map-side-combined count at any scale. Guard length >= 2 on
    //      both sides (Spark's sequence(1,0) counts DOWN, DuckDB's
    //      generate_series(1,0) is empty — the guard sidesteps the
    //      divergence). ----
    GraftQuery(
      "q120_bpe_merge_step",
      (s, d) => {
        val w = graft.functions.TextFunctions.tokens(col("text"))
        Tables.documents(s, d)
          .select(explode(w).as("w"))
          .where(length(col("w")) >= 2)
          .select(explode(transform(
            sequence(lit(1), length(col("w")) - 1),
            i => col("w").substr(i, lit(2)))).as("pair"))
          .groupBy(col("pair")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("pair"))
          .limit(10)
      },
      Some("""
        WITH w AS (
          SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS w
          FROM documents),
        pairs AS (
          SELECT unnest(list_transform(generate_series(1, length(w) - 1),
            i -> substr(w, i, 2))) AS pair
          FROM w WHERE length(w) >= 2)
        SELECT pair, CAST(count(*) AS BIGINT) AS n
        FROM pairs GROUP BY pair
        ORDER BY n DESC, pair LIMIT 10
      """)),

    // ---- q121: LOCF gap-fill (last observation carried forward) — the
    //      time-series repair every feature/metrics pipeline needs:
    //      per user, the running "last purchase amount" filled across
    //      non-purchase events. `last(..., ignoreNulls)` over an
    //      unbounded-preceding frame ≡ DuckDB's
    //      `last_value(x IGNORE NULLS)`; integer cents keep the fill
    //      values hash-exact. Tie-safe ordering via (ts, event_id). ----
    GraftQuery(
      "q121_locf_fill",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        Tables.events(s, d)
          .where(col("user_id") < 40)
          .withColumn("purchase_cents",
            when(col("event_type") === "purchase",
              round(col("value") * 100).cast("long")))
          .select(col("event_id"), col("user_id"),
            coalesce(last(col("purchase_cents"), ignoreNulls = true).over(w), lit(0L))
              .as("last_purchase_cents"))
      },
      Some("""
        SELECT event_id, user_id,
          COALESCE(last_value(
              CASE WHEN event_type = 'purchase'
                   THEN CAST(round(value * 100) AS BIGINT) END
              IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
            AS last_purchase_cents
        FROM events WHERE user_id < 40
      """)),

    // ---- q122: unicode normalization — canonicalize text BEFORE
    //      fingerprint/dedup (composed vs decomposed codepoint
    //      sequences must hash identically). The fixture corpus is
    //      ASCII, so the query synthesizes DECOMPOSED Latin words
    //      (base letter + combining mark, U+0301/U+0308/U+0303) per
    //      doc_id and runs them through expressions.UnicodeNormalize
    //      (JDK Normalizer): NFC composes them, NFD+\p{Mn}-strip drops
    //      the accents. The oracle uses DuckDB's native nfc_normalize/
    //      strip_accents — agreement proves the op is the STANDARD
    //      normalization, not a private one. Codepoint lengths before/
    //      after pin the composition actually happened. ----
    GraftQuery(
      "q122_unicode_normalize",
      (s, d) => {
        val words = array(
          lit("café"),      // café decomposed
          lit("naïve"),     // naïve decomposed
          lit("Zürich"),    // Zürich decomposed
          lit("señor"),     // señor decomposed
          lit("crème"))           // already composed — NFC is identity
        import graft.functions.TextFunctions.{nfc, stripAccents}
        Tables.documents(s, d)
          .where(col("doc_id") < 100)
          .select(col("doc_id"),
            element_at(words, (col("doc_id") % 5 + 1).cast("int")).as("raw"))
          .select(
            col("doc_id"),
            nfc(col("raw")).as("nfc"),
            stripAccents(col("raw")).as("stripped"),
            length(col("raw")).cast("long").as("n_cp_raw"),
            length(nfc(col("raw"))).cast("long").as("n_cp_nfc"))
      },
      Some("""
        WITH w AS (
          SELECT doc_id,
            ['cafe' || chr(769), 'nai' || chr(776) || 've',
             'Zu' || chr(776) || 'rich', 'sen' || chr(771) || 'or',
             'cr' || chr(232) || 'me'][CAST(doc_id % 5 + 1 AS INT)] AS raw
          FROM documents WHERE doc_id < 100)
        SELECT doc_id,
          nfc_normalize(raw) AS nfc,
          strip_accents(raw) AS stripped,
          CAST(length(raw) AS BIGINT) AS n_cp_raw,
          CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_cp_nfc
        FROM w
      """)),

    // ---- q123: URL parsing — the web-corpus staple (domain-based
    //      filtering/sharding, referrer analytics). URLs are
    //      CONSTRUCTED from fixture columns, so the oracle states the
    //      expected components directly by construction while the
    //      Spark side extracts them back with the builtin `parse_url`
    //      (HOST / PATH / keyed QUERY; absent query → NULL) — the
    //      hash-match proves the extractor recovers exactly what was
    //      assembled, nulls included. ----
    GraftQuery(
      "q123_parse_url",
      (s, d) => {
        val url = concat(lit("https://"), col("source"), lit(".example.com/docs/"),
          col("doc_id").cast("string"),
          when(col("doc_id") % 3 === 0, lit(""))
            .otherwise(concat(lit("?ref="), col("lang"))))
        Tables.documents(s, d)
          .select(col("doc_id"), url.as("url"))
          .select(col("doc_id"),
            expr("parse_url(url, 'HOST')").as("host"),
            expr("parse_url(url, 'PATH')").as("path"),
            expr("parse_url(url, 'QUERY', 'ref')").as("ref"))
      },
      Some("""
        SELECT doc_id,
          source || '.example.com' AS host,
          '/docs/' || CAST(doc_id AS VARCHAR) AS path,
          CASE WHEN doc_id % 3 = 0 THEN NULL ELSE lang END AS ref
        FROM documents
      """)),

    // ---- q124: deterministic corpus-mixture sampling — the
    //      data-mixture op of LLM training: each source (language
    //      here) is downsampled at its own rate by comparing a salted
    //      portable hash against rate·2^60, so the mixture is
    //      reproducible run-to-run and engine-to-engine (no rand()),
    //      rows keep/drop INDEPENDENTLY (no shuffle, no per-source
    //      windows), and changing one rate never reshuffles another
    //      source's sample. Thresholds are exact long literals shared
    //      between both engines. ----
    GraftQuery(
      "q124_corpus_mixture",
      (s, d) => {
        val rates = Seq("en" -> 0.8, "zh" -> 0.5, "de" -> 0.3, "es" -> 0.2, "fr" -> 0.1)
        val thresholds = rates.map { case (l, r) => l -> (r * (1L << 60)).toLong }
        val threshCol = coalesce(
          element_at(
            map(thresholds.flatMap { case (l, t) => Seq(lit(l), lit(t)) }: _*),
            col("lang")),
          lit(0L))
        val h = hash60(concat(col("doc_id").cast("string"), lit(":mix")))
        Tables.documents(s, d)
          .withColumn("sampled", h < threshCol)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"))
      },
      Some {
        val rates = Seq("en" -> 0.8, "zh" -> 0.5, "de" -> 0.3, "es" -> 0.2, "fr" -> 0.1)
        val cases = rates.map { case (l, r) =>
          s"WHEN '$l' THEN ${(r * (1L << 60)).toLong}"
        }.mkString(" ")
        s"""
        WITH h AS (
          SELECT lang,
            CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 15)) AS BIGINT) AS hv
          FROM documents)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_total,
          CAST(sum(CASE WHEN hv < CASE lang $cases ELSE 0 END THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        FROM h GROUP BY lang
        """
      }),

    // ---- q139: snapshot diff — the regression report between two
    //      versions of a table (operators.Diff.snapshots: one full
    //      outer shuffle of (key, fingerprint), payloads pruned before
    //      the exchange). Old = orders before 1997-07; new = orders
    //      from 1996-01 with urgent orders' status rewritten — so all
    //      four classifications are populated. The oracle classifies
    //      by direct column comparison, which must agree with the
    //      fingerprint route (DiffSpec pins the fingerprint's
    //      faithfulness: null sentinel, length prefixing). ----
    GraftQuery(
      "q139_snapshot_diff",
      (s, d) => {
        val base = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_orderpriority"),
          col("o_orderdate").cast("string").as("o_date"))
        val old = base.where(col("o_date") < "1997-07-01")
        val neu = base.where(col("o_date") >= "1996-01-01")
          .withColumn("o_orderstatus",
            when(col("o_orderpriority") === "1-URGENT", lit("X"))
              .otherwise(col("o_orderstatus")))
        graft.operators.Diff.snapshots(old, neu, Seq("o_orderkey"))
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n"),
            min(col("o_orderkey")).as("min_key"),
            max(col("o_orderkey")).as("max_key"))
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
            CAST(o_orderdate AS VARCHAR) AS o_date
          FROM orders),
        old AS (SELECT * FROM base WHERE o_date < '1997-07-01'),
        neu AS (
          SELECT o_orderkey, o_custkey,
            CASE WHEN o_orderpriority = '1-URGENT' THEN 'X'
                 ELSE o_orderstatus END AS o_orderstatus,
            o_orderpriority, o_date
          FROM base WHERE o_date >= '1996-01-01'),
        j AS (
          SELECT coalesce(o.o_orderkey, n.o_orderkey) AS k,
            CASE WHEN o.o_orderkey IS NULL THEN 'added'
                 WHEN n.o_orderkey IS NULL THEN 'removed'
                 WHEN o.o_custkey = n.o_custkey
                  AND o.o_orderstatus = n.o_orderstatus
                  AND o.o_orderpriority = n.o_orderpriority
                  AND o.o_date = n.o_date THEN 'unchanged'
                 ELSE 'changed' END AS status
          FROM old o FULL OUTER JOIN neu n ON o.o_orderkey = n.o_orderkey)
        SELECT status, CAST(count(*) AS BIGINT) AS n,
          min(k) AS min_key, max(k) AS max_key
        FROM j GROUP BY status
      """)),

    // ---- q158: hashing-trick linear scorer — the fastText-shaped
    //      quality-classifier SCORING step as a pipeline op: tokens
    //      feature-hash into 1024 buckets (no vocabulary, no shuffle
    //      to build one), each bucket carries a weight, a document's
    //      score is the weighted bag sum. Weights here are derived
    //      in-row from the bucket id (md5 → [-1000, 1000] integers), so
    //      the arithmetic is EXACT and the oracle replicates score and
    //      verdict bit-for-bit; a real deployment broadcasts a trained
    //      weight array — same plan shape, one explode + one groupBy.
    //      The hashing trick is what makes this 100 TB-safe: feature
    //      space is bounded a priori, nothing global is built. ----
    GraftQuery(
      "q158_hashed_classifier",
      (s, d) => {
        import graft.functions.TextFunctions.{hash60, tokens}
        Tables.documents(s, d)
          .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
          .withColumn("b", pmod(hash60(col("tok")), lit(1024L)))
          .withColumn("w",
            pmod(hash60(concat(lit("w:"), col("b").cast("string"))), lit(2001L)) - 1000L)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("score"))
          .select(col("doc_id"), col("n_tokens"), col("score"),
            (col("score") > 0).cast("long").as("accepted"))
      },
      Some("""
        WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
                   FROM documents),
        b AS (SELECT doc_id,
                CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) % 1024 AS b
              FROM t),
        w AS (SELECT doc_id,
                CAST(concat('0x', substr(md5('w:' || CAST(b AS VARCHAR)), 1, 15)) AS BIGINT)
                  % 2001 - 1000 AS w
              FROM b)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
          CAST(sum(w) AS BIGINT) AS score,
          CAST(CASE WHEN sum(w) > 0 THEN 1 ELSE 0 END AS BIGINT) AS accepted
        FROM w GROUP BY doc_id
      """)),

    // ---- q157: compression-ratio quality signal — the Gopher-family
    //      proxy with no model and no vocabulary: deflate_len/byte_len
    //      separates repetitive spam (compresses to almost nothing)
    //      and base64/minified-style blobs (barely compress) from
    //      natural prose. No SQL replica of zlib exists, so the oracle
    //      is the planted-class reduced assertion: per doc, a
    //      repetitive string and a high-entropy hex string derived
    //      from doc_id must classify correctly with wide integer-ratio
    //      margins (5·d < n resp. 5·d > 2·n), and the real text's
    //      compressed length must be positive and bounded. A zlib
    //      regression or a broken expression flips 500 rows. ----
    GraftQuery(
      "q157_compression_quality",
      (s, d) => {
        import graft.functions.TextFunctions.deflateLen
        val repT = concat(repeat(lit("the cat sat on the mat "), 40),
          col("doc_id").cast("string"))
        val entT = concat((1 to 8).map(i =>
          md5(concat(col("doc_id").cast("string"), lit(":" + i)))): _*)
        Tables.documents(s, d).select(
          col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          (deflateLen(repT) * 5 < octet_length(repT)).cast("long").as("rep_ok"),
          (deflateLen(entT) * 5 > octet_length(entT) * 2).cast("long").as("entropy_ok"),
          (deflateLen(col("text")) >= 1 &&
            deflateLen(col("text")) <= octet_length(col("text")) + 64)
            .cast("long").as("real_ok"))
      },
      Some("""
        SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
          CAST(1 AS BIGINT) AS rep_ok, CAST(1 AS BIGINT) AS entropy_ok,
          CAST(1 AS BIGINT) AS real_ok
        FROM documents
      """)),

    // ---- q156: canonical-URL dedup — the crawl-level exact dedup key.
    //      URLs are synthesized with the mess canonicalization exists
    //      for (mixed-case scheme/host, explicit :443, fragments,
    //      utm_*/ref query mixes in every position), then
    //      TextFunctions.canonicalUrl folds the variants and the report
    //      groups by canonical form: variant count, min-doc survivor,
    //      doc checksum. The oracle replicates the SAME regexp chain
    //      (with 'g' — DuckDB regexp_replace is first-match by
    //      default) over the same synthesized urls, so every canonical
    //      string hash-matches. ----
    GraftQuery(
      "q156_url_canonical_dedup",
      (s, d) => {
        import graft.functions.TextFunctions.canonicalUrl
        val url = concat(
          when(col("doc_id") % 2 === 0, lit("HTTPS://")).otherwise(lit("https://")),
          lit("www.Example.COM"),
          when(col("doc_id") % 5 === 0, lit(":443")).otherwise(lit("")),
          lit("/docs/"), expr("doc_id div 3").cast("string"),
          when(col("doc_id") % 3 === 0,
              concat(lit("?utm_source=feed&ref=p"), expr("(doc_id div 3) % 7").cast("string")))
            .when(col("doc_id") % 3 === 1,
              concat(lit("?ref=p"), expr("(doc_id div 3) % 7").cast("string"), lit("&utm_campaign=x")))
            .otherwise(lit("?utm_medium=y")),
          when(col("doc_id") % 7 === 0, lit("#top")).otherwise(lit("")))
        Tables.documents(s, d)
          .select(col("doc_id"), canonicalUrl(url).as("canonical"))
          .groupBy(col("canonical"))
          .agg(count(lit(1)).as("n_urls"),
            min(col("doc_id")).as("survivor_doc"),
            sum(col("doc_id")).as("docs_checksum"))
      },
      Some("""
        WITH u AS (
          SELECT doc_id,
            (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END)
            || 'www.Example.COM'
            || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
            || '/docs/' || CAST(doc_id // 3 AS VARCHAR)
            || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&ref=p' || CAST((doc_id // 3) % 7 AS VARCHAR)
                     WHEN doc_id % 3 = 1 THEN '?ref=p' || CAST((doc_id // 3) % 7 AS VARCHAR) || '&utm_campaign=x'
                     ELSE '?utm_medium=y' END)
            || (CASE WHEN doc_id % 7 = 0 THEN '#top' ELSE '' END) AS url
          FROM documents),
        s1 AS (SELECT doc_id, regexp_replace(url, '#.*', '', 'g') AS u1 FROM u),
        s2 AS (SELECT doc_id, u1,
                 regexp_extract(u1, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*') AS auth
               FROM s1),
        s3 AS (SELECT doc_id,
                 regexp_replace(
                   regexp_replace(lower(auth), '^(https://[^:/?]*):443$', '\1', 'g'),
                   '^(http://[^:/?]*):80$', '\1', 'g')
                 || regexp_replace(
                      regexp_replace(substr(u1, length(auth) + 1),
                        '([?&])(?:(?:utm_[a-z]+|gclid|fbclid)=[^&]*&)+', '\1', 'g'),
                      '[?&](utm_[a-z]+|gclid|fbclid)=[^&]*$', '', 'g') AS canonical
               FROM s2)
        SELECT canonical, CAST(count(*) AS BIGINT) AS n_urls,
          CAST(min(doc_id) AS BIGINT) AS survivor_doc,
          CAST(sum(doc_id) AS BIGINT) AS docs_checksum
        FROM s3 GROUP BY canonical
      """)),

    // ---- q155: grouped exact quantiles — per (returnflag, linestatus,
    //      ship-month) median and quartiles of the cents-exact price.
    //      ~500 groups ≪ the agg-path limit, so the caller PINS the
    //      value-buffering ExactPercentiles aggregate (primitive-array
    //      buffers, arraycopy merge, one sort per group at eval) rather
    //      than paying the dispatcher's extra counting scan of the fact
    //      table; its interpolation is bit-identical to Spark's
    //      percentile aggregate AND the sort path, so quantile_cont
    //      hash-matches on the 0.25 grid (QuantilesSpec pins the
    //      equality on arbitrary percentages). Measured at sf1:
    //      sort path 6.1-7.0 s, percentile map 8.5 s, this ~3.6 s. ----
    GraftQuery(
      "q155_grouped_quantiles",
      (s, d) => {
        val li = Tables.lineitem(s, d).select(
          col("l_returnflag"), col("l_linestatus"),
          date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"),
          (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long").as("cents"))
        graft.operators.Quantiles.gridPercentiles(
            li, Seq("l_returnflag", "l_linestatus", "ship_month"), "cents",
            Seq(0.25, 0.5, 0.75), aggGroupLimit = Long.MaxValue)
          .select(col("l_returnflag"), col("l_linestatus"), col("ship_month"),
            col("n"), col("pct")(0).as("p25"), col("pct")(1).as("p50"),
            col("pct")(2).as("p75"))
      },
      Some("""
        WITH c AS (SELECT l_returnflag, l_linestatus,
                     strftime(l_shipdate, '%Y-%m') AS ship_month,
                     CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
                   FROM lineitem)
        SELECT l_returnflag, l_linestatus, ship_month,
          CAST(count(*) AS BIGINT) AS n,
          quantile_cont(cents, 0.25) AS p25,
          quantile_cont(cents, 0.5) AS p50,
          quantile_cont(cents, 0.75) AS p75
        FROM c GROUP BY l_returnflag, l_linestatus, ship_month
      """)),

    // ---- q153: temperature resampling (sampling ∝ n^0.5 — the
    //      multilingual corpus-balancing step). Quotas ride the
    //      fixed-point trick: one IEEE-exact sqrt floored to a 2^20
    //      grid, then pure integer arithmetic — so quotas AND the
    //      hash-ranked selection (sel_checksum = sum of chosen doc
    //      ids) replicate bit-for-bit in the oracle. en (218 docs)
    //      samples below its share, fr (64) above — the α<1 point. ----
    GraftQuery(
      "q153_temperature_mixture",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val sel = graft.operators.Resample
          .temperatureSample(docs, "lang", "doc_id", budget = 300)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_selected"), sum(col("doc_id")).as("sel_checksum"))
        graft.operators.Resample.temperatureTargets(docs, "lang", budget = 300)
          .join(sel, Seq("lang"), "left")
          .select(col("lang"), col("n_total"), col("n_target"),
            coalesce(col("n_selected"), lit(0L)).as("n_selected"),
            coalesce(col("sel_checksum"), lit(0L)).as("sel_checksum"))
      },
      Some("""
        WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        w AS (SELECT lang, n,
                CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1048576) AS BIGINT) AS wt
              FROM c),
        d AS (SELECT sum(wt) AS dw FROM w),
        t AS (SELECT lang, n, (300 * wt) // dw AS tgt FROM w, d),
        h AS (SELECT lang, doc_id,
                CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':tmix'), 1, 15)) AS BIGINT) AS hv
              FROM documents),
        r AS (SELECT lang, doc_id,
                row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rk
              FROM h),
        sel AS (SELECT r.lang, r.doc_id FROM r JOIN t ON t.lang = r.lang
                WHERE r.rk <= t.tgt)
        SELECT t.lang, CAST(t.n AS BIGINT) AS n_total,
          CAST(t.tgt AS BIGINT) AS n_target,
          CAST(count(s.doc_id) AS BIGINT) AS n_selected,
          CAST(coalesce(sum(s.doc_id), 0) AS BIGINT) AS sel_checksum
        FROM t LEFT JOIN sel s ON s.lang = t.lang
        GROUP BY t.lang, t.n, t.tgt
      """)),

    // ---- q150: per-group quantile profile — exact 0.25-grid anchors
    //      beside the SCALE path. The exact percentiles shuffle every
    //      value; `percentile_approx` (Spark's built-in mergeable GK
    //      summary, map-side partial merge, O(accuracy) state) is what
    //      survives 100 TB — so the query ships both: exact p25/p50/p75
    //      hash-match DuckDB's quantile_cont bit-for-bit (BIGINT cents,
    //      interpolation lands on the exactly-representable 0.25 grid),
    //      and `approx_ok` pins each GK estimate inside the exact
    //      rank-envelope [p−0.02, p+0.02] — ~40× the sketch's declared
    //      1/accuracy rank error, robust to merge-order variation
    //      across partitionings. ----
    GraftQuery(
      "q150_quantile_profile",
      (s, d) => {
        val ps = Seq(0.25, 0.5, 0.75)
        val env = Seq(0.23, 0.27, 0.48, 0.52, 0.73, 0.77)
        // the fixture stores prices as DOUBLE: *100 straight off the
        // double then casting diverges per engine (Spark truncates,
        // DuckDB rounds). The decimal(12,2) waypoint — the repo's
        // standard float-parity route — makes the cents exact on both.
        //
        // fanOut: the exact-percentile partial is CPU-bound and the
        // fixture scan arrives 3-wide — spread it. ONE combined exact
        // buffer serves both the anchors and the envelope (two separate
        // aggregates would each buffer the same values — the built-in
        // `percentile` version measured 3.9 s → 2.5 s combined at
        // sf0.1). The sort-based exact path loses here (4.3 s at
        // sf0.1): with only 3 groups its per-group sort is skew-bound
        // to 3 tasks.
        val li = graft.core.Partitioning.fanOut(
          Tables.lineitem(s, d).select(col("l_returnflag"),
            (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long")
              .cast("double").as("cents")))
        // exact grid via the value-buffering ExactPercentiles aggregate
        // (primitive-array buffer — the per-distinct-value map cost of
        // the built-in `percentile` was THIS query's original
        // bottleneck); one combined 9-point buffer still serves both
        // the anchors and the envelope, and the struct carries n
        val np = org.apache.spark.sql.graft.ColumnBridge.column(
          graft.expressions.ExactPercentiles(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("cents")),
            ps ++ env).toAggregateExpression())
        val agg = li.groupBy(col("l_returnflag")).agg(
          np.as("_np"),
          percentile_approx(col("cents"), array(ps.map(lit): _*), lit(1000)).as("_ap"))
          .select(col("l_returnflag"), col("_np.n").as("n"),
            col("_np.pct").as("_px"), col("_ap"))
        val ok = (0 until 3).map(i =>
          col("_ap")(i) >= col("_px")(3 + 2 * i) && col("_ap")(i) <= col("_px")(4 + 2 * i))
          .reduce(_ && _)
        agg.select(col("l_returnflag"), col("n"),
          col("_px")(0).as("p25"), col("_px")(1).as("p50"), col("_px")(2).as("p75"),
          ok.cast("long").as("approx_ok"))
      },
      Some("""
        WITH c AS (SELECT l_returnflag,
                     CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
                   FROM lineitem)
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
          quantile_cont(cents, 0.25) AS p25,
          quantile_cont(cents, 0.5) AS p50,
          quantile_cont(cents, 0.75) AS p75,
          CAST(1 AS BIGINT) AS approx_ok
        FROM c GROUP BY l_returnflag
      """)),

    // ---- q167: declarative constraint report — the Deequ-style
    //      validation pass (operators.Constraints) a pipeline runs
    //      before publishing: every row-local rule (not-null, range,
    //      accepted domain, regex) folds into ONE scan per table,
    //      uniqueness is one hash aggregate per key, referential
    //      integrity one left join against distinct reference keys.
    //      The rule set deliberately mixes passing rules (PKs, FKs,
    //      domains) with failing ones (quantity capped at 30,
    //      l_partkey uniqueness) so the report's ok column carries
    //      signal, not a constant. ----
    GraftQuery(
      "q167_constraint_report",
      (s, d) => {
        import graft.operators.Constraints._
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        val liReport = check(li, Seq(
          NotNull("li_orderkey_notnull", "l_orderkey"),
          InRange("li_quantity_range_1_30", "l_quantity", 1, 30),
          Accepted("li_returnflag_domain", "l_returnflag", Seq("A", "N", "R")),
          MatchesRegex("li_linestatus_regex", "l_linestatus", "^[OF]$"),
          Unique("li_line_pk", Seq("l_orderkey", "l_linenumber")),
          Unique("li_partkey_unique", Seq("l_partkey")),
          ForeignKey("li_orderkey_fk", Seq("l_orderkey"), o, Seq("o_orderkey"))))
        val oReport = check(o, Seq(
          ForeignKey("o_custkey_fk", Seq("o_custkey"), c, Seq("c_custkey")),
          InRange("o_totalprice_positive", "o_totalprice", 0, 1000000000)))
        liReport.unionAll(oReport)
      },
      Some("""
        SELECT rule, CAST(violations AS BIGINT) AS violations,
          CAST(total AS BIGINT) AS total,
          CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS ok
        FROM (
          SELECT 'li_orderkey_notnull' AS rule,
            sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS violations,
            count(*) AS total FROM lineitem
          UNION ALL SELECT 'li_quantity_range_1_30',
            sum(CASE WHEN l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 30
                THEN 1 ELSE 0 END), count(*) FROM lineitem
          UNION ALL SELECT 'li_returnflag_domain',
            sum(CASE WHEN l_returnflag IS NULL OR l_returnflag NOT IN ('A','N','R')
                THEN 1 ELSE 0 END), count(*) FROM lineitem
          UNION ALL SELECT 'li_linestatus_regex',
            sum(CASE WHEN l_linestatus IS NULL
                OR NOT regexp_matches(l_linestatus, '^[OF]$')
                THEN 1 ELSE 0 END), count(*) FROM lineitem
          UNION ALL SELECT 'li_line_pk',
            coalesce((SELECT sum(c) FROM (SELECT count(*) c FROM lineitem
              GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1) t), 0),
            (SELECT count(*) FROM lineitem)
          UNION ALL SELECT 'li_partkey_unique',
            coalesce((SELECT sum(c) FROM (SELECT count(*) c FROM lineitem
              GROUP BY l_partkey HAVING count(*) > 1) t), 0),
            (SELECT count(*) FROM lineitem)
          UNION ALL SELECT 'li_orderkey_fk',
            sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END), count(*)
            FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
              ON l.l_orderkey = o.o_orderkey
          UNION ALL SELECT 'o_custkey_fk',
            sum(CASE WHEN cc.c_custkey IS NULL THEN 1 ELSE 0 END), count(*)
            FROM orders ot LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) cc
              ON ot.o_custkey = cc.c_custkey
          UNION ALL SELECT 'o_totalprice_positive',
            sum(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
                OR o_totalprice > 1000000000 THEN 1 ELSE 0 END), count(*)
            FROM orders
        ) r
      """)),

    // ---- q183: Benford first-digit audit over order totals — the
    //      classic fabricated-data screen. The leading digit comes
    //      from integer cents (floor(x·100) is one IEEE double op,
    //      identical both engines; the bigint's decimal string is
    //      engine-independent — no float log10, no double
    //      formatting). One map-side-combined 9-group aggregate;
    //      share in ppm by truncating division. ----
    GraftQuery(
      "q183_benford_digits",
      (s, d) => {
        val digit = substring(
          col("cents").cast("string"), 1, 1).cast("long").as("digit")
        val t = org.apache.spark.sql.expressions.Window.partitionBy()
        Tables.orders(s, d)
          .where(col("o_totalprice") > 0)
          .select(floor(col("o_totalprice") * 100).cast("long").as("cents"))
          .select(digit)
          .groupBy(col("digit")).agg(count(lit(1)).as("n"))
          .withColumn("total", sum(col("n")).over(t))
          .select(col("digit"), col("n"),
            expr("cast(1000000 * n div total as bigint)").as("share_ppm"))
      },
      Some("""
        WITH c AS (
          SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                   AS VARCHAR), 1, 1) AS BIGINT) AS digit
          FROM orders WHERE o_totalprice > 0),
        g AS (SELECT digit, CAST(count(*) AS BIGINT) n FROM c GROUP BY digit)
        SELECT digit, n,
          CAST(1000000 * n // (SELECT sum(n) FROM g) AS BIGINT) AS share_ppm
        FROM g
      """)),

    // ---- q187: per-group OLS trend slope in exact rational form —
    //      daily revenue trend per order priority as the integer pair
    //      (n·Σxy − Σx·Σy, n·Σx² − (Σx)²) plus the micro-slope by
    //      truncating division (identical semantics both engines —
    //      probed: DuckDB `//` truncates toward zero like Spark
    //      `div`). regr_slope() is one float op away, but floats
    //      can't hash-match; the rational form is exact at any scale
    //      (decimal(38,0)/HUGEINT products — int64 would overflow
    //      ~100× above sf0.1). One map-side-combined aggregate per
    //      level after the daily rollup. ----
    GraftQuery(
      "q187_trend_slopes",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .select(col("o_orderpriority"),
            to_date(col("o_orderdate")).as("day"),
            floor(col("o_totalprice") * 100).cast("long").as("cents"))
          .groupBy(col("o_orderpriority"), col("day"))
          .agg(sum(col("cents")).as("y"))
          .withColumn("x",
            datediff(col("day"), lit("1996-01-01").cast("date")).cast("long"))
        daily.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_days"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(expr("cast(x as decimal(38,0)) * y")).as("sxy"),
            sum(expr("cast(x as decimal(38,0)) * x")).as("sx2"))
          .select(col("o_orderpriority"), col("n_days"),
            expr("cast(cast(n_days as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sy as bigint)")
              .as("slope_num"),
            expr("cast(cast(n_days as decimal(38,0)) * sx2 - cast(sx as decimal(38,0)) * sx as bigint)")
              .as("slope_den"),
            expr("cast((cast(1000000 as decimal(38,0)) * (cast(n_days as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sy)) div (cast(n_days as decimal(38,0)) * sx2 - cast(sx as decimal(38,0)) * sx) as bigint)")
              .as("slope_micro"))
      },
      Some("""
        WITH daily AS (
          SELECT o_orderpriority, CAST(o_orderdate AS DATE) dy,
            sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS y
          FROM orders GROUP BY 1, 2),
        xy AS (
          SELECT o_orderpriority,
            CAST(date_diff('day', DATE '1996-01-01', dy) AS BIGINT) x, y
          FROM daily),
        g AS (
          SELECT o_orderpriority, CAST(count(*) AS BIGINT) n_days,
            sum(CAST(x AS HUGEINT)) sx, sum(CAST(y AS HUGEINT)) sy,
            sum(CAST(x AS HUGEINT) * y) sxy, sum(CAST(x AS HUGEINT) * x) sx2
          FROM xy GROUP BY 1)
        SELECT o_orderpriority, n_days,
          CAST(n_days * sxy - sx * sy AS BIGINT) AS slope_num,
          CAST(n_days * sx2 - sx * sx AS BIGINT) AS slope_den,
          CAST(CAST(1000000 AS HUGEINT) * (n_days * sxy - sx * sy)
            // (n_days * sx2 - sx * sx) AS BIGINT) AS slope_micro
        FROM g
      """)),

    // ---- q188: longest consecutive-active-day streak per user,
    //      reported as a histogram — the gaps-and-islands kernel
    //      (island id = epoch_day − row_number is constant exactly on
    //      consecutive runs). One per-user window pass over DISTINCT
    //      active days, then two map-side-combined aggregates; the
    //      histogram is bounded by the longest streak, not the user
    //      count. ----
    GraftQuery(
      "q188_longest_streak",
      (s, d) => {
        val days = Tables.events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("day"))
        val streaks = days
          .withColumn("grp",
            datediff(col("day"), lit("1970-01-01").cast("date"))
              - row_number().over(w))
          .groupBy(col("user_id"), col("grp"))
          .agg(count(lit(1)).as("len"))
        streaks.groupBy(col("user_id")).agg(max(col("len")).as("max_streak"))
          .groupBy(col("max_streak")).agg(count(lit(1)).as("n_users"))
      },
      Some("""
        WITH days AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) dy FROM events),
        isl AS (
          SELECT user_id,
            date_diff('day', DATE '1970-01-01', dy)
              - row_number() OVER (PARTITION BY user_id ORDER BY dy) AS grp
          FROM days),
        streaks AS (
          SELECT user_id, grp, CAST(count(*) AS BIGINT) len
          FROM isl GROUP BY user_id, grp),
        mx AS (SELECT user_id, max(len) max_streak FROM streaks GROUP BY user_id)
        SELECT max_streak, CAST(count(*) AS BIGINT) AS n_users
        FROM mx GROUP BY max_streak
      """)),

    // ---- q190: shipping-latency SLA percentiles by order month —
    //      p50/p90/p99 of lineitem ship delay (days after order),
    //      exact interpolated order statistics per month. ~100 months
    //      ≪ the agg-path limit → the caller pins the value-buffering
    //      ExactPercentiles path (q155's rationale; the join output
    //      would make the dispatcher's counting scan extra costly
    //      here). Day diffs are exact integers; quantile_cont
    //      interpolation bit-matches. ----
    GraftQuery(
      "q190_latency_percentiles",
      (s, d) => {
        val delays = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderdate"))
          .join(Tables.lineitem(s, d)
            .select(col("l_orderkey").as("o_orderkey"), col("l_shipdate")),
            Seq("o_orderkey"))
          .select(
            date_format(col("o_orderdate"), "yyyy-MM").as("month"),
            datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
              .cast("long").as("delay_days"))
        graft.operators.Quantiles
          .gridPercentiles(delays, Seq("month"), "delay_days", Seq(0.5, 0.9, 0.99),
            aggGroupLimit = Long.MaxValue)
          .select(col("month"), col("n"),
            col("pct")(0).as("p50"), col("pct")(1).as("p90"), col("pct")(2).as("p99"))
      },
      Some("""
        WITH d AS (
          SELECT strftime(o.o_orderdate, '%Y-%m') AS month,
            CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
              CAST(l.l_shipdate AS DATE)) AS BIGINT) AS delay_days
          FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey)
        SELECT month, CAST(count(*) AS BIGINT) AS n,
          quantile_cont(delay_days, 0.5) AS p50,
          quantile_cont(delay_days, 0.9) AS p90,
          quantile_cont(delay_days, 0.99) AS p99
        FROM d GROUP BY month
      """)),

    // ---- q192: RFM segmentation — every customer quartiled on
    //      Recency (latest order), Frequency (order count), Monetary
    //      (lifetime cents), then segment sizes. The classic CRM
    //      cohorting; the workload shape is three ntile windows over
    //      the CUSTOMER DIMENSION (not the fact table) with
    //      deterministic custkey tie-breaks, so both engines quartile
    //      identically. ≤64 output rows. ----
    GraftQuery(
      "q192_rfm_segments",
      (s, d) => {
        val per = Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(max(to_date(col("o_orderdate"))).as("last_day"),
            count(lit(1)).as("freq"),
            sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
        def quart(order: org.apache.spark.sql.Column*) =
          ntile(4).over(org.apache.spark.sql.expressions.Window.orderBy(order: _*))
        per
          .withColumn("r", quart(col("last_day").desc, col("o_custkey")).cast("long"))
          .withColumn("f", quart(col("freq").desc, col("o_custkey")).cast("long"))
          .withColumn("m", quart(col("cents").desc, col("o_custkey")).cast("long"))
          .groupBy(col("r"), col("f"), col("m"))
          .agg(count(lit(1)).as("n_customers"),
            sum(col("cents")).as("segment_cents"))
      },
      Some("""
        WITH per AS (
          SELECT o_custkey, max(CAST(o_orderdate AS DATE)) last_day,
            CAST(count(*) AS BIGINT) freq,
            sum(CAST(floor(o_totalprice * 100) AS BIGINT)) cents
          FROM orders GROUP BY o_custkey),
        q AS (
          SELECT cents,
            CAST(ntile(4) OVER (ORDER BY last_day DESC, o_custkey) AS BIGINT) r,
            CAST(ntile(4) OVER (ORDER BY freq DESC, o_custkey) AS BIGINT) f,
            CAST(ntile(4) OVER (ORDER BY cents DESC, o_custkey) AS BIGINT) m
          FROM per)
        SELECT r, f, m, CAST(count(*) AS BIGINT) AS n_customers,
          CAST(sum(cents) AS BIGINT) AS segment_cents
        FROM q GROUP BY r, f, m
      """)),

    // ---- q193: Pareto concentration — the smallest customer set
    //      covering 80% of revenue, plus where the fixture actually
    //      sits on the 80/20 curve. One desc sort + running sum over
    //      the customer DIMENSION (orders already aggregated away);
    //      the crossing rank is found with integer cross-multiplied
    //      comparison (cum·5 ≥ total·4), no percent floats. ----
    GraftQuery(
      "q193_pareto_customers",
      (s, d) => {
        val per = Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("cents").desc, col("o_custkey"))
        val t = org.apache.spark.sql.expressions.Window.partitionBy()
        per
          .withColumn("rk", row_number().over(w).cast("long"))
          .withColumn("cum", sum(col("cents")).over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .withColumn("total", sum(col("cents")).over(t))
          .withColumn("n_customers", count(lit(1)).over(t))
          .where(col("cum") * 5 >= col("total") * 4)
          .groupBy(col("n_customers"), col("total"))
          .agg(min(col("rk")).as("k80"))
          .select(col("n_customers"), col("k80"),
            expr("cast(1000000 * k80 div n_customers as bigint)").as("k80_share_ppm"),
            col("total").as("total_cents"))
      },
      Some("""
        WITH per AS (
          SELECT o_custkey, sum(CAST(floor(o_totalprice * 100) AS BIGINT)) cents
          FROM orders GROUP BY o_custkey),
        r AS (
          SELECT cents,
            CAST(row_number() OVER (ORDER BY cents DESC, o_custkey) AS BIGINT) rk,
            sum(cents) OVER (ORDER BY cents DESC, o_custkey
              ROWS UNBOUNDED PRECEDING) cum,
            sum(cents) OVER () total,
            CAST(count(*) OVER () AS BIGINT) n_customers
          FROM per)
        SELECT n_customers, CAST(min(rk) AS BIGINT) AS k80,
          CAST(1000000 * min(rk) // n_customers AS BIGINT) AS k80_share_ppm,
          CAST(min(total) AS BIGINT) AS total_cents
        FROM r WHERE cum * 5 >= total * 4
        GROUP BY n_customers
      """)),

    // ---- q194: hierarchical percent-of-parent rollup — each nation's
    //      revenue share WITHIN its region (the drill-down report
    //      shape: child value + share of parent in one row). Fact
    //      aggregates to the customer's nation first (one shuffle),
    //      the dim joins broadcast, and the share window runs over the
    //      25-row nation dimension. Exact cents, ppm share. ----
    GraftQuery(
      "q194_region_share",
      (s, d) => {
        val rev = Tables.orders(s, d)
          .select(col("o_custkey"),
            floor(col("o_totalprice") * 100).cast("long").as("cents"))
          .join(Tables.customer(s, d)
            .select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
            Seq("o_custkey"))
          .groupBy(col("c_nationkey")).agg(sum(col("cents")).as("cents"))
        val dim = Tables.nation(s, d)
          .select(col("n_nationkey").as("c_nationkey"), col("n_name"), col("n_regionkey"))
          .join(Tables.region(s, d)
            .select(col("r_regionkey").as("n_regionkey"), col("r_name")),
            Seq("n_regionkey"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("r_name"))
        rev.join(broadcast(dim), Seq("c_nationkey"))
          .withColumn("region_cents", sum(col("cents")).over(w))
          .select(col("r_name"), col("n_name"), col("cents"),
            expr("cast(1000000 * cents div region_cents as bigint)").as("share_ppm"))
      },
      Some("""
        WITH rev AS (
          SELECT c.c_nationkey, sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) cents
          FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
          GROUP BY c.c_nationkey),
        j AS (
          SELECT r.r_name, n.n_name, rev.cents,
            sum(rev.cents) OVER (PARTITION BY r.r_name) region_cents
          FROM rev JOIN nation n ON n.n_nationkey = rev.c_nationkey
                   JOIN region r ON r.r_regionkey = n.n_regionkey)
        SELECT r_name, n_name, CAST(cents AS BIGINT) AS cents,
          CAST(1000000 * cents // region_cents AS BIGINT) AS share_ppm
        FROM j
      """)),

    // ---- q197: month-over-month top movers — the parts whose revenue
    //      changed most vs the previous month (the "what happened"
    //      BI drill). Monthly part revenue and the lag window SHARE ONE
    //      exchange: the explicit repartition on l_partkey alone
    //      satisfies both the groupBy's ClusteredDistribution(partkey,
    //      month) — same partkey ⇒ same partition ⇒ same (partkey,
    //      month) co-located — and the window's partitionBy(partkey),
    //      so neither inserts its own shuffle (plan-asserted in
    //      NewQueries8cSpec). Distributed top-10 by absolute delta with
    //      (part, month) tie-breaks. Exact cents. ----
    GraftQuery(
      "q197_top_movers",
      (s, d) => {
        val monthly = Tables.lineitem(s, d)
          .select(col("l_partkey"),
            date_format(col("l_shipdate"), "yyyy-MM").as("month"),
            floor(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec2(col("l_discount"))) * 100)
              .cast("long").as("cents"))
          .repartition(col("l_partkey"))
          .groupBy(col("l_partkey"), col("month"))
          .agg(sum(col("cents")).as("cents"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_partkey")).orderBy(col("month"))
        monthly
          .withColumn("prev", lag(col("cents"), 1).over(w))
          .where(col("prev").isNotNull)
          .withColumn("delta", col("cents") - col("prev"))
          .orderBy(abs(col("delta")).desc, col("l_partkey"), col("month"))
          .limit(10)
          .select(col("l_partkey").as("part"), col("month"),
            col("prev").as("prev_cents"), col("cents").as("cur_cents"),
            col("delta"))
      },
      Some("""
        WITH m AS (
          SELECT l_partkey, strftime(l_shipdate, '%Y-%m') AS month,
            sum(CAST(floor(CAST(l_extendedprice AS DECIMAL(12,2))
              * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
              * 100) AS BIGINT)) AS cents
          FROM lineitem GROUP BY 1, 2),
        d AS (
          SELECT l_partkey, month, cents,
            lag(cents, 1) OVER (PARTITION BY l_partkey ORDER BY month) prev
          FROM m)
        SELECT l_partkey AS part, month,
          CAST(prev AS BIGINT) AS prev_cents,
          CAST(cents AS BIGINT) AS cur_cents,
          CAST(cents - prev AS BIGINT) AS delta
        FROM d WHERE prev IS NOT NULL
        ORDER BY abs(cents - prev) DESC, l_partkey, month LIMIT 10
      """)),

    // ---- q198: basket brand-diversity histogram — distinct brands
    //      per order, then how many orders sit at each diversity
    //      level (the assortment breadth readout). The 25-brand part
    //      dimension broadcasts onto the fact scan; two map-side-
    //      combined aggregates after. ----
    GraftQuery(
      "q198_basket_diversity",
      (s, d) => {
        val perOrder = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey"))
          .join(broadcast(Tables.part(s, d)
            .select(col("p_partkey").as("l_partkey"), col("p_brand"))),
            Seq("l_partkey"))
          .groupBy(col("l_orderkey"))
          .agg(countDistinct(col("p_brand")).as("n_brands"))
        perOrder.groupBy(col("n_brands"))
          .agg(count(lit(1)).as("n_orders"))
      },
      Some("""
        WITH per AS (
          SELECT l.l_orderkey, CAST(count(DISTINCT p.p_brand) AS BIGINT) n_brands
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          GROUP BY l.l_orderkey)
        SELECT n_brands, CAST(count(*) AS BIGINT) AS n_orders
        FROM per GROUP BY n_brands
      """)),

    // ---- q199: customers above their nation's average spend — the
    //      correlated-subquery classic, decorrelated to one nation-
    //      level aggregate broadcast back (no per-row subquery). The
    //      above-average test is integer cross-multiplied
    //      (cents·n > total — no float average), so the count is
    //      exact. ----
    GraftQuery(
      "q199_above_nation_avg",
      (s, d) => {
        val spend = Tables.orders(s, d)
          .select(col("o_custkey"),
            floor(col("o_totalprice") * 100).cast("long").as("cents"))
          .groupBy(col("o_custkey")).agg(sum(col("cents")).as("cents"))
          .join(Tables.customer(s, d)
            .select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
            Seq("o_custkey"))
        val nat = spend.groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("total_cents"))
        spend.join(broadcast(nat), Seq("c_nationkey"))
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey").as("c_nationkey"), col("n_name"))),
            Seq("c_nationkey"))
          .groupBy(col("n_name"))
          .agg(max(col("n_cust")).as("n_customers"),
            sum(when(expr("cast(cents as decimal(38,0)) * n_cust > total_cents"), 1L)
              .otherwise(0L)).as("n_above"))
          .withColumn("above_ppm",
            expr("cast(1000000 * n_above div n_customers as bigint)"))
      },
      Some("""
        WITH spend AS (
          SELECT o.o_custkey, c.c_nationkey,
            sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) cents
          FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
          GROUP BY o.o_custkey, c.c_nationkey),
        nat AS (
          SELECT c_nationkey, CAST(count(*) AS BIGINT) n_cust,
            sum(cents) total_cents
          FROM spend GROUP BY c_nationkey)
        SELECT n.n_name,
          CAST(max(nat.n_cust) AS BIGINT) AS n_customers,
          CAST(sum(CASE WHEN CAST(s.cents AS HUGEINT) * nat.n_cust > nat.total_cents
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
          CAST(1000000 * sum(CASE WHEN CAST(s.cents AS HUGEINT) * nat.n_cust
                     > nat.total_cents THEN 1 ELSE 0 END)
               // max(nat.n_cust) AS BIGINT) AS above_ppm
        FROM spend s JOIN nat USING (c_nationkey)
             JOIN nation n ON n.n_nationkey = s.c_nationkey
        GROUP BY n.n_name
      """)),

    // ---- q201: autocorrelation of the daily order series at lags 1
    //      and 7 — the seasonality detector (lag-7 high = weekly
    //      cycle), in the q187 exact-rational discipline: Pearson
    //      moments over (y_t, y_{t+k}) pairs as decimal(38,0)/HUGEINT
    //      integers, and the SQUARED correlation in ppm (the square
    //      clears the irrational sqrt; the sign rides separately).
    //      The lead windows run over the BOUNDED daily series (~2 400
    //      rows), not the fact table. ----
    GraftQuery(
      "q201_autocorrelation",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("dy"))
          .agg(count(lit(1)).as("y"))
        val w = org.apache.spark.sql.expressions.Window.orderBy(col("dy"))
        def lagged(k: Int) = daily
          .withColumn("ynext", lead(col("y"), k).over(w))
          .where(col("ynext").isNotNull)
          .select(lit(k.toLong).as("lag"), col("y").as("x"), col("ynext"))
        lagged(1).unionAll(lagged(7))
          .groupBy(col("lag"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("x")).as("sx"), sum(col("ynext")).as("sy"),
            sum(expr("cast(x as decimal(38,0)) * ynext")).as("sxy"),
            sum(expr("cast(x as decimal(38,0)) * x")).as("sx2"),
            sum(expr("cast(ynext as decimal(38,0)) * ynext")).as("sy2"))
          .select(col("lag"), col("n_pairs"),
            expr("cast(cast(n_pairs as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sy as bigint)")
              .as("cov_num"),
            expr("""cast(
              (cast(1000000 as decimal(38,0))
                * (cast(n_pairs as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sy)
                * (cast(n_pairs as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sy))
              div ((cast(n_pairs as decimal(38,0)) * sx2 - cast(sx as decimal(38,0)) * sx)
                 * (cast(n_pairs as decimal(38,0)) * sy2 - cast(sy as decimal(38,0)) * sy))
              as bigint)""").as("corr2_ppm"),
            expr("cast(case when cast(n_pairs as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sy < 0 then -1 else 1 end as bigint)")
              .as("direction"))
      },
      Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) dy, CAST(count(*) AS BIGINT) y
          FROM orders GROUP BY 1),
        l AS (
          SELECT 1 AS lag, y AS x, lead(y, 1) OVER (ORDER BY dy) AS ynext FROM daily
          UNION ALL
          SELECT 7, y, lead(y, 7) OVER (ORDER BY dy) FROM daily),
        k AS (SELECT * FROM l WHERE ynext IS NOT NULL),
        g AS (
          SELECT lag, CAST(count(*) AS BIGINT) n_pairs,
            sum(CAST(x AS HUGEINT)) sx, sum(CAST(ynext AS HUGEINT)) sy,
            sum(CAST(x AS HUGEINT) * ynext) sxy,
            sum(CAST(x AS HUGEINT) * x) sx2,
            sum(CAST(ynext AS HUGEINT) * ynext) sy2
          FROM k GROUP BY lag)
        SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
          CAST(n_pairs * sxy - sx * sy AS BIGINT) AS cov_num,
          CAST(CAST(1000000 AS HUGEINT) * (n_pairs * sxy - sx * sy)
            * (n_pairs * sxy - sx * sy)
            // NULLIF((n_pairs * sx2 - sx * sx) * (n_pairs * sy2 - sy * sy), 0)
            AS BIGINT) AS corr2_ppm,
          CAST(CASE WHEN n_pairs * sxy - sx * sy < 0 THEN -1 ELSE 1 END AS BIGINT)
            AS direction
        FROM g
      """))
  )
}
