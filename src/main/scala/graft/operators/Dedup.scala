package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators for the LLM-data-pipeline surface: exact
  * (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket-join →
  * exact verify), SimHash (banded Hamming), and blocked exact n-gram
  * Jaccard.
  *
  * Scale design: every variant avoids the O(N²) cross join. MinHash/
  * SimHash candidate generation is a self-equi-join on (band, signature)
  * — a shuffle join on a high-cardinality key; the exact verification
  * join pulls shingle sets by doc id (shuffle join on id). Blocked
  * Jaccard bounds pairs by a caller-supplied blocking key. At 100 TB the
  * only quadratic work left is within-bucket, which the band/row
  * parameters control.
  */
object Dedup {

  /** Exact dedup: canonicalize → fingerprint → keep lowest id per group. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(fingerprint(col(textCol)).as("fingerprint"), col(idCol))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  private def fanOut(df: DataFrame): DataFrame = graft.core.Partitioning.fanOut(df)

  /** Distinct word-`n`-gram shingle sets per document (docs shorter than
    * `n` tokens are excluded — cross-engine concat-null semantics).
    */
  private def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    fanOut(df).select(col(idCol).as("doc_id"), col(textCol).as("txt"))
      .where(tokenCount(col("txt")) >= n) // cheap zero-alloc pre-filter
      .select(col("doc_id"), textShingles(col("txt"), n).as("sh"))

  /** MinHash + LSH near-dup pairs, exact-verified.
    *
    * k = bands·rowsPerBand minhashes; candidates = documents agreeing on
    * all rows of at least one band; each candidate pair is then verified
    * with exact Jaccard ≥ tau on the shingle sets. Deterministic
    * cross-engine: the salted-md5 signature makes the candidate set (not
    * just the verified result) reproducible in the DuckDB oracle.
    */
  def minhashLsh(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, bands: Int = 8, rowsPerBand: Int = 2,
      tau: Double = 0.3): DataFrame = {
    val k = bands * rowsPerBand
    // Staged once: the shingle sets feed the signature AND both sides of
    // the verification join; the banded signatures feed both sides of
    // the candidate self-join. Without staging each consumer re-runs the
    // tokenize/shingle/minhash pipeline from the scan. localCheckpoint
    // (not persist) across all dedup staging: blocks release via the
    // ContextCleaner when the result is unreachable — library calls must
    // not accumulate session-lifetime cache entries.
    val s = shingleSets(df, idCol, textCol, shingleN)
      .localCheckpoint()
    val sig = s.select(col("doc_id"), col("sh"), minhashSignature(col("sh"), k).as("sig"))
    val bandCol = explode(sequence(lit(0), lit(bands - 1))).as("band")
    // checkpointByKey: the checkpoint remembers its (band, bsig) hash
    // distribution, so the candidate self-join plans with zero per-side
    // exchanges (core.Partitioning.checkpointByKey's scaladoc has the
    // AQE mechanics).
    val banded = graft.core.Partitioning.checkpointByKey(
      sig.select(col("doc_id"), bandCol, col("sig"))
        .select(col("doc_id"), col("band"),
          concat_ws("", (0 until rowsPerBand).map(r =>
            element_at(col("sig"), col("band") * rowsPerBand + r + 1)): _*).as("bsig")),
      col("band"), col("bsig"))
    verifiedJaccardPairs(s, banded, tau)
  }

  /** Shared LSH tail: banded-signature self-join → distinct candidate
    * pairs → exact-Jaccard verification against the staged shingle
    * sets. Both MinHash families (salted-md5 oracle path and xxhash64
    * fast path) end here, so an exactness fix reaches both.
    */
  private def verifiedJaccardPairs(
      s: DataFrame, banded: DataFrame, tau: Double): DataFrame = {
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val withSets = cand
      .join(s.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(s.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
    val (nInter, nUnion) = jaccardParts(col("sh_a"), col("sh_b"))
    withSets
      .select(col("doc_a"), col("doc_b"), nInter.as("n_inter"), nUnion.as("n_union"))
      .withColumn("jaccard", col("n_inter").cast("double") / col("n_union"))
      .where(col("jaccard") >= tau)
  }

  /** INCREMENTAL MinHash + LSH: near-dup pairs BETWEEN a new batch and
    * an existing corpus — the production ingest shape. A daily delta
    * must not re-dedup the whole 100 TB corpus against itself: band
    * signatures of the (small) batch join band signatures of the
    * corpus, so the corpus is touched once per ingest and only
    * band-colliding rows reach the exact-Jaccard verify. At steady
    * state the corpus-side signatures would be a persisted index table
    * (computed once at their own ingest) — the signature algebra here
    * is IDENTICAL to [[minhashLsh]]'s, so precomputed signatures drop
    * in. Output: (doc_new, doc_old, n_inter, n_union, jaccard) with
    * jaccard ≥ tau; ids live in separate universes (no i<j
    * canonicalization across tables).
    *
    * The returned plan references internal localCheckpoints; a
    * LONG-LIVED driver calling this per ingest round must
    * [[Lineage.release]] each result after consuming it, or checkpoint
    * blocks accumulate round over round (a batch job can skip it — the
    * blocks die with the context).
    */
  def minhashLshIncremental(
      corpus: DataFrame, batch: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, bands: Int = 8, rowsPerBand: Int = 2,
      tau: Double = 0.3): DataFrame =
    minhashLshIncrementalIndexed(
      signatureIndex(corpus, idCol, textCol, shingleN, bands * rowsPerBand)
        .localCheckpoint(),
      batch, idCol, textCol, shingleN, bands, rowsPerBand, tau)

  /** Persistable signature index: (doc_id, sh, sig) — everything the
    * incremental probe needs (band keys derive from `sig`, the exact
    * verify reads `sh`), so steady-state ingest computes each doc's
    * signatures ONCE, stores them (e.g. `Load.replaceTable`/append),
    * and never re-tokenizes the corpus. One narrow pass, no shuffle.
    */
  def signatureIndex(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 16): DataFrame =
    shingleSets(df, idCol, textCol, shingleN)
      .select(col("doc_id"), col("sh"), minhashSignature(col("sh"), k).as("sig"))

  /** [[minhashLshIncremental]] against a PREBUILT [[signatureIndex]] —
    * the steady-state serving path (read the index table, probe, then
    * append the batch's own signatures for the next ingest).
    */
  def minhashLshIncrementalIndexed(
      index: DataFrame, batch: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, bands: Int = 8, rowsPerBand: Int = 2,
      tau: Double = 0.3): DataFrame = {
    val k = bands * rowsPerBand
    val sb = signatureIndex(batch, idCol, textCol, shingleN, k).localCheckpoint()
    def bandedOf(s: DataFrame): DataFrame =
      s.select(col("doc_id"),
          explode(sequence(lit(0), lit(bands - 1))).as("band"), col("sig"))
        .select(col("doc_id"), col("band"),
          concat_ws("", (0 until rowsPerBand).map(r =>
            element_at(col("sig"), col("band") * rowsPerBand + r + 1)): _*).as("bsig"))
    val cand = bandedOf(sb).as("x").join(bandedOf(index).as("y"),
        col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig"))
      .select(col("x.doc_id").as("doc_new"), col("y.doc_id").as("doc_old"))
      .distinct()
    val withSets = cand
      .join(sb.select(col("doc_id").as("doc_new"), col("sh").as("sh_a")), Seq("doc_new"))
      .join(index.select(col("doc_id").as("doc_old"), col("sh").as("sh_b")), Seq("doc_old"))
    val (nInter, nUnion) = jaccardParts(col("sh_a"), col("sh_b"))
    withSets
      .select(col("doc_new"), col("doc_old"), nInter.as("n_inter"), nUnion.as("n_union"))
      .withColumn("jaccard", col("n_inter").cast("double") / col("n_union"))
      .where(col("jaccard") >= tau)
  }

  /** MinHash + LSH near-dup pairs — FAST PATH. Same structure as
    * [[minhashLsh]] (shingle → signature → band → bucket self-join →
    * exact-Jaccard verify ≥ tau) but signatures are k multiply-add
    * permutations of ONE xxhash64 per shingle (expressions.
    * MinHashSigFast) instead of k salted-md5 digests per shingle —
    * ~10× cheaper on the hashing-dominated stage. The verified output
    * is still exact per pair; only candidate RECALL is approximate, as
    * with any MinHash family. Use [[minhashLsh]] when cross-engine
    * (oracle) reproducibility of the candidate set matters.
    */
  def minhashLshFast(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, bands: Int = 8, rowsPerBand: Int = 2,
      tau: Double = 0.3): DataFrame = {
    val k = bands * rowsPerBand
    val s = shingleSets(df, idCol, textCol, shingleN)
      .localCheckpoint()
    val sig = s.select(col("doc_id"),
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.expressions.MinHashSigFast(
          org.apache.spark.sql.graft.ColumnBridge.expression(
            transform(col("sh"), sh => xxhash64(sh))), k)).as("sig"))
    // band key: xxhash64 over (band, its rows). A 64-bit collision can
    // only ADD a candidate pair, which exact verification then scores —
    // it cannot lose one.
    // checkpointByKey: candidate self-join arrives co-partitioned on
    // (band, bsig) — zero per-side exchanges.
    val banded = graft.core.Partitioning.checkpointByKey(
      sig.select(col("doc_id"),
          explode(sequence(lit(0), lit(bands - 1))).as("band"), col("sig"))
        .select(col("doc_id"), col("band"),
          xxhash64((col("band") +: (0 until rowsPerBand).map(r =>
            element_at(col("sig"), col("band") * rowsPerBand + r + 1))): _*).as("bsig")),
      col("band"), col("bsig"))
    verifiedJaccardPairs(s, banded, tau)
  }

  /** 64-bit SimHash of the token array: majority vote per bit over
    * xxhash64(token), via the custom codegen expression (one pass over
    * the hashes; the nested-SQL-lambda formulation it replaces cost 64
    * interpreted folds per document).
    */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame =
    fanOut(df).select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) > 0)
      .withColumn("hs", transform(col("toks"), t => xxhash64(t)))
      .withColumn("simhash",
        org.apache.spark.sql.graft.ColumnBridge.column(
          graft.expressions.SimHash64(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("hs")))))
      .select(col("doc_id"), col("simhash"))

  /** Edit-distance near-dup pairs within a normalized-prefix block.
    *
    * Levenshtein is O(len²) per pair and unblocked pairing is O(N²), so
    * this only ever compares documents sharing the first `prefixLen`
    * chars of the canonical form — the same bounded-pairs contract as
    * the other dedup variants (prefix blocking assumes near-dups agree
    * early; combine with [[simhash60Pairs]] when they may not). The
    * length pre-filter (|len(a)−len(b)| ≤ maxDist, a Levenshtein lower
    * bound) discards hopeless pairs before the quadratic distance runs.
    */
  def levenshteinBlocked(
      df: DataFrame, idCol: String, textCol: String,
      prefixLen: Int = 20, maxDist: Int = 30): DataFrame = {
    // checkpointByKey on the block key: the blocked self-join plans with
    // zero per-side exchanges (blk is the only equi-key).
    val n = graft.core.Partitioning.checkpointByKey(
      fanOut(df).select(col(idCol).as("doc_id"), normalized(col(textCol)).as("nm"))
        .withColumn("blk", substring(col("nm"), 1, prefixLen)),
      col("blk"))
    // Custom banded levenshtein (O(len·maxDist), early exit, codegen):
    // Catalyst pushes the final distance filter into the join condition,
    // so the distance runs for EVERY same-block hash match — the
    // built-in's collation-aware path measured ~1 ms per ~300-char pair
    // (seconds of wall for a few thousand matches); the banded kernel is
    // ~µs. Returns -1 past the threshold, hence the between filter.
    def lev(a: Column, b: Column): Column =
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.expressions.LevenshteinBanded(
          org.apache.spark.sql.graft.ColumnBridge.expression(a),
          org.apache.spark.sql.graft.ColumnBridge.expression(b),
          maxDist))
    n.as("x").join(n.as("y"),
        col("x.blk") === col("y.blk") && col("x.doc_id") < col("y.doc_id") &&
          abs(length(col("x.nm")) - length(col("y.nm"))) <= maxDist)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        lev(col("x.nm"), col("y.nm")).cast("long").as("edit_dist"))
      .where(col("edit_dist").between(0, maxDist))
  }

  /** Engine-portable 60-bit SimHash: identical to [[simhash64]] but the
    * token hash is `TextFunctions.hash60` (md5-derived) instead of the
    * Spark-private xxhash64, so a SQL oracle can replicate every vote.
    * Bits 60-63 of each hash are zero → they always vote −1 → those
    * signature bits are always clear; the effective signature width is
    * 60 bits. Same SimHash64 codegen kernel.
    */
  def simhash60(df: DataFrame, idCol: String, textCol: String): DataFrame =
    fanOut(df).select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) > 0)
      .withColumn("hs", transform(col("toks"), t => hash60(t)))
      .withColumn("simhash",
        org.apache.spark.sql.graft.ColumnBridge.column(
          graft.expressions.SimHash64(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("hs")))))
      .select(col("doc_id"), col("simhash"))

  /** Portable-SimHash near-dup pairs: 4×15-bit bands over the 60-bit
    * signature → bucket join → Hamming ≤ maxHamming. Banding is the
    * scale path (never O(N²)); it can miss a ≤maxHamming pair whose
    * differing bits spread across all 4 bands, so the DuckDB oracle
    * (q79) replicates the banding itself rather than a full scan.
    */
  def simhash60Pairs(
      df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 5): DataFrame =
    hammingBandPairs(simhash60(df, idCol, textCol), bandBits = 15, maxHamming)

  /** Shared SimHash tail: 4 band slices of the signature → bucket
    * self-join → Hamming ≤ maxHamming via bit_count(xor). Used by both
    * the xxhash64 (16-bit bands) and portable (15-bit bands) families.
    */
  private def hammingBandPairs(
      sh: DataFrame, bandBits: Int, maxHamming: Int): DataFrame = {
    val mask = (1L << bandBits) - 1
    val banded = graft.core.Partitioning.checkpointByKey(
      sh.select(col("doc_id"), col("simhash"),
          explode(array((0 until 4).map { b =>
            struct(lit(b).as("band"),
              shiftright(col("simhash"), bandBits * b).bitwiseAND(lit(mask)).as("bsig"))
          }: _*)).as("bs"))
        .select(col("doc_id"), col("simhash"), col("bs.band"), col("bs.bsig")),
      // staged: both self-join sides (and the optimizer's isnotnull
      // join-key filters) would otherwise recompute the simhash pipeline.
      // Re-measured at sf0.1 (round 3): with vs without staging is
      // inside run-to-run noise locally (±0.3 s, opposite signs on
      // q36/q79); kept because the recompute it prevents grows with the
      // corpus while the banded table stays 4 rows/doc. Round 10: staged
      // via checkpointByKey so the self-join is exchange-free.
      col("band"), col("bsig"))
    // filter BEFORE distinct (the dHashPairs discipline): hamming is a
    // pure function of the pair, so order doesn't change results — but
    // it moves the Hamming verify into the codegen'd join stage and
    // shrinks the distinct's shuffle from the candidate set to the
    // qualifying pairs.
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** SimHash near-dup pairs: 4×16-bit bands → bucket join → Hamming
    * distance ≤ maxHamming via bit_count(xor).
    */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 12): DataFrame =
    hammingBandPairs(simhash64(df, idCol, textCol), bandBits = 16, maxHamming)

  /** Exact n-gram Jaccard pairs within a blocking key (the bounded-pairs
    * pattern: never a global cross join).
    *
    * Set intersection is computed by EXPLODE + equi-join + count rather
    * than per-pair `array_intersect`: only colliding shingles generate
    * work, non-overlapping pairs cost nothing, and the join shuffles on
    * (block, shingle) — the formulation that survives 100 TB. Pairs
    * sharing zero shingles never appear, which is identical output for
    * any tau > 0. (Measured at sf0.1: per-pair array_intersect ≈ 35 s;
    * exploded self-join ≈ 18 s, dominated by re-running the tokenize
    * pipeline per join side; this staged group-and-expand form ≈ 5 s.)
    */
  def ngramJaccardBlocked(
      df: DataFrame, idCol: String, textCol: String, blockCol: String,
      n: Int = 2, tau: Double = 0.25): DataFrame = {
    require(tau > 0, "tau must be positive (zero-overlap pairs are never emitted)")
    // Single-pass, zero staging: each document's shingle-set SIZE rides
    // along with its id through the explode, so the sizes need no second
    // consumer of the pipeline and no join-back — the whole query is one
    // linear plan (scan → explode → two shuffles). Earlier formulations
    // staged the shingle sets via localCheckpoint to feed three
    // consumers; under a contended local disk that staging write was the
    // query's whole cost (observed 36 s vs ~5 s), and at cluster scale it
    // would be a checkpoint table nobody needs.
    val s = df.select(col(idCol).as("doc_id"), col(blockCol).as("blk"), col(textCol).as("txt"))
      .where(tokenCount(col("txt")) >= n)
      .select(col("doc_id"), col("blk"), textShingles(col("txt"), n).as("sh"))
      .withColumn("n_sh", size(col("sh")).cast("long"))
    // One shuffle on (block, gram): gather each gram's (doc, set-size)
    // list and expand i<j combinations in-place — no self-join, no
    // second pipeline evaluation. Group sizes are bounded by block size
    // (df-pruning of ubiquitous grams would bound them further at
    // scale). The raw gram string is the group key: hashing it
    // (xxhash64) would shuffle fewer bytes but a 64-bit collision
    // silently inflates n_inter, and the query is exact by contract.
    val ex = s.select(col("blk"), explode(col("sh")).as("g"),
      struct(col("doc_id"), col("n_sh")).as("d"))
    // sort_array on struct(doc_id, n_sh) orders by doc_id first (n_sh is
    // functionally dependent on doc_id), so pair orientation a < b is
    // identical to the doc-id-only formulation.
    val grouped = ex.groupBy(col("blk"), col("g"))
      .agg(sort_array(collect_list(col("d"))).as("ds"))
      .where(size(col("ds")) > 1)
    val combos = flatten(transform(sequence(lit(0), size(col("ds")) - 2), i =>
      transform(sequence(i + 1, size(col("ds")) - 1), j =>
        struct(element_at(col("ds"), i + 1).as("a"), element_at(col("ds"), j + 1).as("b")))))
    // Second shuffle groups per pair; the sizes come along in the key
    // (functionally dependent on the ids — no extra cardinality).
    grouped.select(col("blk").as("block"), explode(combos).as("p"))
      .groupBy(col("block"), col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"),
        col("p.a.n_sh").as("n_a"), col("p.b.n_sh").as("n_b"))
      .agg(count(lit(1)).as("n_inter"))
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
      .withColumn("jaccard", col("n_inter").cast("double") / col("n_union"))
      .where(col("jaccard") >= tau)
      .select(col("block"), col("doc_a"), col("doc_b"),
        col("n_inter"), col("n_union"), col("jaccard"))
  }
}
