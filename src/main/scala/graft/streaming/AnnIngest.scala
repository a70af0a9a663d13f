package graft.streaming

import org.apache.spark.internal.Logging
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.load.Load
import graft.operators.{IndexStore, Ivf, IvfPq}

/** Structured-Streaming maintenance of a persisted ANN index — the
  * daily-embedding-ingest shape: a PRE-BUILT index (centroids/codebooks
  * trained once by a batch `build`) is extended append-only per
  * micro-batch with frozen centroids.
  *
  * == Segmented appends — per-trigger publish is O(batch) ==
  *
  * Round 11 republished the ENTIRE assignments/coded table per trigger
  * through the whole-directory swap — O(index) publish bytes. New
  * vectors never modify existing rows (frozen centroids, append-only
  * semantics), so each trigger now assigns/encodes ONLY the batch and
  * commits it as an immutable `seg_<batchId>/` child of the component
  * directory ([[IndexStore.appendSegment]] — staged beside the
  * component, one atomic rename in). [[IndexStore.loadIvf]]/
  * [[IndexStore.loadIvfPq]] read components through the store's
  * liveness view, so probes see base + live segments as one table; a
  * probe mid-commit sees either the pre- or post-batch file set, never
  * a torn segment.
  *
  * Segment COUNT is bounded separately from drift: many small triggers
  * keep the streamed fraction low while segments pile up (every probe
  * lists each one, every trigger reads each `_count` sidecar), so past
  * `maxSegments` live segments the sink compacts
  * ([[IndexStore.compactSegments]] — single atomic rename, dead
  * parts excluded by rule and swept after the reader grace window).
  * Compaction is TWO-LEVEL so write amplification stays O(log) per
  * row over a long rebuild horizon: minors fold the segments — and
  * only them — into standalone cseg runs; a size-ratio full fold
  * consolidates every run into one fseg when the runs rival the
  * consolidated bytes (geometrically spaced, like the gram store's
  * majors). There is no per-key merge (segments are disjoint row
  * sets) and no level resets drift accounting: folded rows were
  * encoded with frozen centroids and stay counted as streamed. A
  * batch REBUILD (mandated by recall drift below) remains the only
  * reset.
  *
  * Standing soak gate: `sbt "Test/runMain graft.dev.StoreSoaks"`
  * soaks this store (and the gram store) through 50 real micro-batches
  * at sf1 — diff its per-trigger columns against the recorded table in
  * BASELINE.md ("Standing store-soak gate") after any
  * store/compaction change.
  *
  * Exactly-once across crashes: the applied-batch watermark is the max
  * committed segment id (the rename IS the commit — no separate
  * watermark write to tear), seeded by the `_applied_batch` sidecar a
  * rebuild publishes via `IndexStore.save*(…, sidecars)`. A replay of
  * an applied batch skips byte-identically; a crash inside the staged
  * write leaves only an invisible staging dir, swept on the next
  * trigger. The body runs under [[Load.withLock]] on the index
  * directory — a concurrent writer (a rebuild job, a second stream) is
  * refused loudly. NOTE the lock has no expiry: a HARD crash inside
  * the locked body leaves `<indexDir>__lock` on disk and every replay
  * fails with [[graft.load.LockHeldException]] until an operator
  * confirms no writer is alive and deletes the lock file — recovery is
  * fail-loud, not automatic (advice r11).
  *
  * == Recall drift — measured and ENFORCED ==
  *
  * Frozen centroids mean appended vectors never re-balance cells, so
  * recall decays as the streamed fraction grows. The sink now tracks
  * base-vs-streamed row counts ([[IndexStore.componentCounts]] — per-
  * segment `_count` sidecars plus a cached base count, no table scan)
  * and acts on two documented thresholds of
  * streamed / (base + streamed), both measured INCLUDING the incoming
  * batch:
  *  - above `warnStreamedFraction` (default 0.25): log a warning per
  *    trigger naming the counts — schedule the rebuild now;
  *  - above `maxStreamedFraction` (default 0.5): REFUSE the batch
  *    (fail-loud IllegalStateException) before anything is written —
  *    rebuild via `Ivf.build`/`IvfPq.build` + `IndexStore.save*` with
  *    an `_applied_batch` sidecar carrying the last applied id, then
  *    restart the stream. At 0.5 half the corpus was assigned to
  *    centroids trained on the other half; past it the index is more
  *    drift than index.
  *
  * Preconditions: the index must exist (bootstrap with
  * `Ivf.build`/`IvfPq.build` + `IndexStore.save*`); batch ids must be
  * globally unique across the stream (Ivf's documented contract —
  * duplicate ids shadow each other in top-k scoring; replays of the
  * SAME batch are the watermark's job, not this rule's).
  */
object AnnIngest extends Logging {

  val AppliedBatchFile = "_applied_batch"

  val DefaultWarnStreamedFraction = 0.25
  val DefaultMaxStreamedFraction = 0.5

  /** Compact live segments into one past this bound. Higher than the
    * gram store's 16: ANN compaction rewrites ALL streamed rows (no
    * per-key merge shrinks them), so the amortized per-trigger rewrite
    * cost is streamed/maxSegments — 64 keeps it small while listing 64
    * directories stays trivial.
    */
  val DefaultMaxSegments = 64

  private def appliedBatch(
      spark: org.apache.spark.sql.SparkSession, dir: String, component: String): Long = {
    val sidecar = IndexStore.readSidecar(spark, dir, AppliedBatchFile)
      .map(_.trim.toLong).getOrElse(-1L)
    (sidecar +: IndexStore.segmentIds(spark, dir, component)).max
  }

  /** Drift gate: warn/refuse on the streamed fraction AFTER this batch
    * lands. Runs before any write, so a refused batch leaves the store
    * untouched (the stream dies loudly; rebuild and restart).
    */
  private def enforceDrift(
      spark: org.apache.spark.sql.SparkSession, dir: String, component: String,
      batchRows: Long, warnAt: Double, maxAt: Double, batchId: Long): Unit = {
    val (base, streamed) = IndexStore.componentCounts(spark, dir, component)
    val after = streamed + batchRows
    val frac = if (base + after == 0L) 0.0 else after.toDouble / (base + after)
    if (frac > maxAt)
      throw new IllegalStateException(
        f"ANN index $dir: streamed fraction $frac%.3f after batch $batchId " +
          f"($after streamed vs $base base rows) exceeds maxStreamedFraction=$maxAt%.2f " +
          "— frozen centroids have drifted too far; rebuild (Ivf/IvfPq.build + " +
          "IndexStore.save* with an _applied_batch sidecar) and restart the stream")
    if (frac > warnAt)
      logWarning(
        f"ANN index $dir: streamed fraction $frac%.3f ($after streamed vs $base base " +
          f"rows) exceeds warnStreamedFraction=$warnAt%.2f — schedule a batch rebuild " +
          "before recall decays further")
  }

  /** Start an IVF-flat ingest stream over `vecs` (idCol + vecCol). */
  def ivfIngestSink(
      vecs: DataFrame, indexDir: String, checkpoint: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      warnStreamedFraction: Double = DefaultWarnStreamedFraction,
      maxStreamedFraction: Double = DefaultMaxStreamedFraction,
      maxSegments: Int = DefaultMaxSegments,
      sweepGraceMs: Long = IndexStore.DefaultSweepGraceMs): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyIvfBatch(batch, batchId, indexDir, idCol, vecCol,
          warnStreamedFraction, maxStreamedFraction, maxSegments, sweepGraceMs)
      }
      .start()

  /** One IVF micro-batch application — public for the crash-window
    * specs (the SubstringIngest.applyBatch precedent). Idempotent per
    * batchId.
    */
  def applyIvfBatch(
      batch: DataFrame, batchId: Long, indexDir: String,
      idCol: String, vecCol: String,
      warnStreamedFraction: Double = DefaultWarnStreamedFraction,
      maxStreamedFraction: Double = DefaultMaxStreamedFraction,
      maxSegments: Int = DefaultMaxSegments,
      sweepGraceMs: Long = IndexStore.DefaultSweepGraceMs): Unit = {
    batch.persist()
    try {
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        Load.withLock(spark, indexDir, s"ivfIngestSink batch=$batchId") {
          if (batchId > appliedBatch(spark, indexDir, "assignments")) {
            IndexStore.cleanStaleStaging(spark, indexDir)
            IndexStore.sweepDead(spark, indexDir, "assignments", sweepGraceMs)
            val centroids = IndexStore.loadIvfCentroids(spark, indexDir)
            enforceDrift(spark, indexDir, "assignments", batch.count(),
              warnStreamedFraction, maxStreamedFraction, batchId)
            IndexStore.appendSegment(spark, indexDir, "assignments",
              Ivf.assignNew(centroids, batch, idCol, vecCol), batchId)
            if (IndexStore.liveStreamSegments(spark, indexDir, "assignments") > maxSegments)
              IndexStore.compactSegments(spark, indexDir, "assignments",
                maxRuns = maxSegments)
          }
        }.get
      }
    } finally batch.unpersist()
    ()
  }

  /** Start an IVF-PQ ingest stream (frozen centroids AND codebooks —
    * new vectors are residual-encoded with the trained quantizer).
    */
  def ivfPqIngestSink(
      vecs: DataFrame, indexDir: String, checkpoint: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      warnStreamedFraction: Double = DefaultWarnStreamedFraction,
      maxStreamedFraction: Double = DefaultMaxStreamedFraction,
      maxSegments: Int = DefaultMaxSegments,
      sweepGraceMs: Long = IndexStore.DefaultSweepGraceMs): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyIvfPqBatch(batch, batchId, indexDir, idCol, vecCol,
          warnStreamedFraction, maxStreamedFraction, maxSegments, sweepGraceMs)
      }
      .start()

  /** One IVF-PQ micro-batch application. Idempotent per batchId. */
  def applyIvfPqBatch(
      batch: DataFrame, batchId: Long, indexDir: String,
      idCol: String, vecCol: String,
      warnStreamedFraction: Double = DefaultWarnStreamedFraction,
      maxStreamedFraction: Double = DefaultMaxStreamedFraction,
      maxSegments: Int = DefaultMaxSegments,
      sweepGraceMs: Long = IndexStore.DefaultSweepGraceMs): Unit = {
    batch.persist()
    try {
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        Load.withLock(spark, indexDir, s"ivfPqIngestSink batch=$batchId") {
          if (batchId > appliedBatch(spark, indexDir, "coded")) {
            IndexStore.cleanStaleStaging(spark, indexDir)
            IndexStore.sweepDead(spark, indexDir, "coded", sweepGraceMs)
            val (centroids, cb) = IndexStore.loadIvfPqCodec(spark, indexDir)
            enforceDrift(spark, indexDir, "coded", batch.count(),
              warnStreamedFraction, maxStreamedFraction, batchId)
            IndexStore.appendSegment(spark, indexDir, "coded",
              IvfPq.encodeNew(centroids, cb, batch, idCol, vecCol), batchId)
            if (IndexStore.liveStreamSegments(spark, indexDir, "coded") > maxSegments)
              IndexStore.compactSegments(spark, indexDir, "coded",
                maxRuns = maxSegments)
          }
        }.get
      }
    } finally batch.unpersist()
    ()
  }
}
