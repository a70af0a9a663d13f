package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** SemDeDup-style semantic deduplication (public method: Abbas et al.,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", arXiv:2303.09540): partition the corpus into coarse
  * cells by nearest-centroid assignment, then within each cell drop
  * every document whose embedding is near-identical (cosine >= tau) to
  * a kept lower-id member. The cell bound is the whole point at scale:
  * pair scoring happens only inside a cell, so the kernel is a shuffle
  * on the cell id plus per-cell upper-triangle scoring — never a
  * corpus-wide all-pairs. Cross-cell near-duplicates are deliberately
  * unreachable; that is the method's documented recall trade-off, and
  * the q151 flag measures it against the exact pair set.
  *
  * Survivor policy is pairwise domination: a document is dropped iff
  * SOME smaller-id same-cell document sits within tau of it. This is
  * deterministic, order-free, and embarrassingly parallel (each pair
  * votes independently — no sequential greedy scan), at the cost of
  * occasionally dropping both ends of a chain a sequential scan would
  * have kept one of. The reference method's choice (keep one per
  * epsilon-ball) has the same property.
  *
  * Two centroid families share the kernel:
  *   - [[semanticDedup]]: the first-nCells-ids seed family (data
  *     vectors themselves — zero arithmetic, engine-portable, so a
  *     DuckDB oracle replicates the FULL pipeline bit-for-bit).
  *   - [[semanticDedupLloyd]]: [[Ivf.build]]'s Lloyd-refined codebook —
  *     the quality path (better-shaped cells capture more true pairs).
  *     Cell means are float sums whose accumulation order varies with
  *     partitioning, so this path is spec/flag-gated rather than
  *     hash-compared (the q48/q112 precedent).
  */
object SemDedup {

  /** Per-document dedup verdicts against seed centroids (the portable
    * anchor): returns (idCol, cell, kept) — `cell` is the chosen
    * centroid's id, `kept` is false iff a smaller-id same-cell member
    * sits within cosine >= tau.
    */
  def semanticDedup(
      df: DataFrame, idCol: String, vecCol: String, nCells: Int,
      tau: Double): DataFrame = {
    require(nCells > 0, s"nCells must be positive, got $nCells")
    val p = Similarity.prep(df, idCol, vecCol)
    // seed cells: the nCells smallest-id vectors, cid = the seed's own
    // vid (no global row_number — an unpartitioned window funnels
    // through one partition; the Ivf.build precedent)
    val seeds = p.orderBy(col("vid")).limit(nCells)
      .select(col("vid").as("cid"), col("v").as("cvec"))
    // staged ONCE: verdicts references the frame three times (both
    // self-join sides + primary) and Catalyst clones the corpus ×
    // centroid scoring pipeline per reference — the checkpoint runs it
    // once. PLAIN checkpoint, not checkpointByKey(cid): k-means cells
    // are density-skewed, and a cid-co-partitioned self-join pins the
    // hot cell whole into one task where AQE's skew splitting (which
    // needs an exchange to act on) can't help — measured at sf1, plain
    // staging 4.7-4.9 s vs cid-hash 5.5 s for q151 (the
    // approxScoredPairs finding, same mechanism). The result plan
    // references the checkpoint (primary reads it), so the consumer's
    // Lineage.release frees the blocks.
    val assigned =
      Ivf.nearest(p, seeds, keep = 1).localCheckpoint(true)
    verdicts(assigned, assigned, tau, idCol)
  }

  /** Per-document dedup verdicts against a Lloyd-refined codebook (the
    * quality path — same kernel, better cells). The index frames that
    * [[Ivf.build]] persists are released before returning; the result
    * is eagerly materialized first, so callers get a plain frame with
    * no cache entries left behind.
    *
    * @param probes cells each vector is scored in (multi-probe). With
    *   probes = 2 a document also competes in its second-nearest cell,
    *   which recovers most near-duplicates the cell boundary would have
    *   split (the published method's documented recall loss) for one
    *   extra copy of the corpus through the cid shuffle. Reported
    *   `cell` stays the PRIMARY assignment either way.
    */
  def semanticDedupLloyd(
      df: DataFrame, idCol: String, vecCol: String, nCells: Int,
      tau: Double, lloydSteps: Int = 2, probes: Int = 2): DataFrame = {
    require(probes >= 1, s"probes must be >= 1, got $probes")
    val index = Ivf.build(df, idCol, vecCol, nCells, lloydSteps)
    try {
      // multi-probe assignments staged once (single-probe reuses the
      // build's persisted assignments — already cached, the self-join
      // sides read the cache): one scoring pass instead of one per
      // self-join side. Plain checkpoint, not cid-hash — see
      // semanticDedup above (skewed cells defeat a co-partitioned
      // self-join). Released below — the eager result checkpoint
      // orphans it from every later release.
      val probed =
        if (probes == 1) index._2
        else Ivf.nearest(Similarity.prep(df, idCol, vecCol), index._1, keep = probes)
          .localCheckpoint(true)
      try verdicts(index._2, probed, tau, idCol).localCheckpoint(true)
      finally { if (probed ne index._2) Lineage.release(probed) }
    } finally Ivf.release(index)
  }

  /** Lloyd-refined cell ASSIGNMENTS only — (idCol, cell), no domination
    * pass. For capture-recall measurement (the q151 flag) the pair
    * scoring inside cells is wasted work; this trims the build to the
    * index itself. With `probes > 1` a vector appears once per probed
    * cell (up to `probes` rows).
    */
  def lloydCells(
      df: DataFrame, idCol: String, vecCol: String, nCells: Int,
      lloydSteps: Int = 2, probes: Int = 1): DataFrame = {
    require(probes >= 1, s"probes must be >= 1, got $probes")
    val index = Ivf.build(df, idCol, vecCol, nCells, lloydSteps)
    try {
      val cellsOf =
        if (probes == 1) index._2
        else Ivf.nearest(Similarity.prep(df, idCol, vecCol), index._1, keep = probes)
      cellsOf.select(col("vid").as(idCol), col("cid").as("cell"))
        .localCheckpoint(true)
    } finally Ivf.release(index)
  }

  /** Seed-cell ASSIGNMENTS (the portable centroid family: the nCells
    * smallest-id vectors themselves) with multi-probe — (idCol, cell,
    * prnk), one row per probed cell, prnk 1 = the primary assignment.
    * Zero centroid arithmetic, so an engine-independent oracle
    * replicates the whole frame bit-for-bit (the q151 idiom extended
    * with probe rank) — this is what makes the q152 cross-cell
    * recovered-pair report hash-checkable end to end.
    */
  def seedCells(
      df: DataFrame, idCol: String, vecCol: String, nCells: Int,
      probes: Int = 1): DataFrame = {
    require(nCells > 0, s"nCells must be positive, got $nCells")
    require(probes >= 1, s"probes must be >= 1, got $probes")
    val p = Similarity.prep(df, idCol, vecCol)
    val seeds = p.orderBy(col("vid")).limit(nCells)
      .select(col("vid").as("cid"), col("v").as("cvec"))
    Ivf.nearest(p, seeds, keep = probes, keepRank = true)
      .select(col("vid").as(idCol), col("cid").as("cell"), col("prnk"))
  }

  /** The shared kernel: within-cell pairwise domination. `probed` holds
    * the (cid, vid, v) rows pairs are scored in (one row per probed
    * cell — a pair competes if ANY probed cell is shared); `primary`
    * holds the single reported assignment per vid. For single-probe
    * callers the two are the same frame.
    *
    * The verdict join back is NOT hinted: the dominated set's size is
    * the corpus duplicate count, and SemDeDup's target workloads drop
    * ~50% of a web-scale corpus — an unconditional broadcast blows up
    * exactly where the operator matters. `dominated` ends in an
    * aggregate, so AQE sees its true size at the stage boundary and
    * converts the join to broadcast only when it actually fits
    * (runtime equivalent of KCore's counted BroadcastMaxPeel gate,
    * without the extra counting job).
    */
  private def verdicts(
      primary: DataFrame, probed: DataFrame, tau: Double, idCol: String): DataFrame = {
    val a = probed.select(col("cid"), col("vid"), col("v"))
    val dominated = a.as("x")
      .join(a.as("y"),
        col("x.cid") === col("y.cid") && col("x.vid") < col("y.vid"))
      .where(dot(col("x.v"), col("y.v")) >= tau)
      .select(col("y.vid").as("vid")).distinct()
    primary
      .join(dominated.withColumn("_dom", lit(true)), Seq("vid"), "left")
      .select(col("vid").as(idCol), col("cid").as("cell"),
        coalesce(!col("_dom"), lit(true)).as("kept"))
  }
}
