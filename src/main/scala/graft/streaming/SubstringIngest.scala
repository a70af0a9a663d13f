package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.load.Load
import graft.operators.SubstringDedup

/** Structured-Streaming ingest for exact substring dedup (the Lee et
  * al. 2021 keep-first shape, reference semantics on
  * [[graft.operators.SubstringDedup]]): each micro-batch of documents
  * is probed against the persisted gram index of everything ingested
  * before it, its retention report is published, and the index is
  * folded forward — the corpus is never re-tokenized. This is the
  * daily-crawl-drop shape at 100 TB: per-trigger work is
  * O(batch grams) for the probe plus one index fold, not O(corpus).
  *
  * Exactly-once across crashes (the metricsStoreSink discipline,
  * adapted to TABLE-valued state that cannot be recomputed from a raw
  * landing without re-tokenizing history):
  *
  *  - The published index carries an applied-batch watermark in a
  *    sidecar file INSIDE the swapped directory ([[AppliedBatchFile]]),
  *    so index content and watermark are atomic by construction —
  *    [[Load.replaceTable]]'s staged swap publishes both or neither.
  *  - Per batch, the order is: report first (from the PRE-fold index,
  *    `overwrite` into a batch-id-keyed directory), then fold+publish.
  *    The two crash windows replay cleanly:
  *    (a) crash after the report, before the publish — the replay sees
  *        watermark < batchId, recomputes the report from the UNCHANGED
  *        index (same bytes, overwritten in place) and folds;
  *    (b) crash after the publish, before the stream checkpoint commit
  *        — the replay sees watermark >= batchId and skips the batch
  *        entirely (the report was written before the fold, so it is
  *        already complete; re-probing the post-fold index would
  *        misreport every batch gram as duplicated — the skip is
  *        correctness, not just economy).
  *  - A crash INSIDE the publish leaves either the old state (replay =
  *    window a) or the new state (replay = window b); replaceTable's
  *    backup/restore contract covers the swap itself.
  *
  * The whole body runs under [[Load.withLock]] on the index directory:
  * concurrent writers (a second stream, a batch backfill) are refused
  * loudly rather than silently interleaving fold state.
  *
  * PRECONDITION (inherited from [[SubstringDedup.updateGramIndex]]):
  * doc_ids must be globally unique across the stream's lifetime —
  * foreachBatch replays of the SAME batch are handled by the watermark,
  * but a SOURCE that re-emits an id under a new batch would conflate
  * packed orders. Set `checkIds = true` to pay one index distinct per
  * trigger for a fail-loud guard ([[SubstringDedup.overlappingIds]]).
  */
object SubstringIngest {

  /** Watermark sidecar inside the index dir (underscore-prefixed:
    * invisible to Spark's parquet reader). Content: the last APPLIED
    * micro-batch id as a decimal string.
    */
  val AppliedBatchFile = "_applied_batch"

  /** Schema of [[SubstringDedup.gramIndex]] — needed to read an index
    * that may be empty (zero parquet rows defeat inference).
    */
  val IndexSchema: StructType = StructType(Seq(
    StructField("g", StringType), StructField("fp", LongType),
    StructField("cnt", LongType)))

  /** Published index state: (index-so-far, last applied batch id).
    * A missing directory (first start) and a PRE-EXISTING index built
    * by a batch bootstrap (gramIndex + replaceTable, no watermark) both
    * read as watermark -1 — every stream batch id (>= 0) applies on
    * top of whatever index content is there.
    */
  def readState(spark: SparkSession, indexDir: String): (DataFrame, Long) = {
    val dir = new Path(indexDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir))
      (spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], IndexSchema), -1L)
    else {
      val marker = new Path(dir, AppliedBatchFile)
      val applied =
        if (!fs.exists(marker)) -1L
        else {
          val in = fs.open(marker)
          try new String(in.readAllBytes(), "UTF-8").trim.toLong finally in.close()
        }
      (spark.read.schema(IndexSchema).parquet(indexDir), applied)
    }
  }

  /** Atomic publish of a folded index + its applied-batch watermark
    * (one staged swap — see the crash-window analysis above).
    */
  def publishState(
      spark: SparkSession, folded: DataFrame, indexDir: String,
      appliedBatch: Long): Unit =
    Load.replaceTable(spark, folded, indexDir, decorateStaging = { staging =>
      val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(new Path(staging, AppliedBatchFile), true)
      try out.write(appliedBatch.toString.getBytes("UTF-8")) finally out.close()
    }).get

  /** Start the ingest stream.
    *
    * @param docs       streaming DataFrame with (`doc_id` long-castable,
    *                   `text` string) columns
    * @param indexDir   persisted gram index (created if absent; a batch
    *                   bootstrap via gramIndex + replaceTable is honored)
    * @param reportDir  retention reports, one `__batch=<id>` child per
    *                   micro-batch (same columns as cleanKeepFirst:
    *                   doc_id, n_tokens, removed_tokens, removed_ppm,
    *                   kept_md5)
    * @param checkpoint stream checkpoint location
    * @param k          gram width in tokens
    * @param checkIds   fail loudly if a batch re-uses an indexed doc_id
    */
  def substringIngestSink(
      docs: DataFrame, indexDir: String, reportDir: String,
      checkpoint: String, k: Int = 8,
      checkIds: Boolean = false): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, indexDir, reportDir, k, checkIds)
      }
      .start()

  /** One micro-batch application — the foreachBatch body, public so the
    * crash-window specs can replay it at chosen interruption points
    * (the MetricsStoreSpec discipline). Idempotent per batchId.
    */
  def applyBatch(
      batch: DataFrame, batchId: Long, indexDir: String, reportDir: String,
      k: Int = 8, checkIds: Boolean = false): Unit = {
    // one evaluation of the micro-batch source: the empty check, the
    // report probe, and the index fold all read cached rows
    batch.persist()
    try {
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        Load.withLock(spark, indexDir, s"substringIngestSink batch=$batchId") {
          val (index, applied) = readState(spark, indexDir)
          if (batchId > applied) {
            if (checkIds) SubstringDedup.assertDisjointIds(index, batch)
            // the probe and the fold both gram the batch — the
            // persist() above makes that two cache reads, not two
            // source evaluations; the index side is plain parquet,
            // shared lazily by both plans
            SubstringDedup.cleanKeepFirstIncremental(index, batch, k)
              .write.mode("overwrite")
              .parquet(s"$reportDir/${MetricsStore.BatchCol}=$batchId")
            publishState(spark,
              SubstringDedup.updateGramIndex(index, batch, k),
              indexDir, batchId)
          }
          // else: replayed fully-applied batch — the report was
          // written BEFORE the publish, so it already exists with
          // the right bytes; recomputing it against the post-fold
          // index would be wrong, not just wasteful (window b)
        }.get
      }
    } finally batch.unpersist()
    ()
  }

  /** All retention reports published so far, with the batch column
    * dropped (the read surface mirrors batch cleanKeepFirst's schema).
    */
  def readReports(spark: SparkSession, reportDir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_tokens", LongType),
      StructField("removed_tokens", LongType), StructField("removed_ppm", LongType),
      StructField("kept_md5", StringType),
      StructField(MetricsStore.BatchCol, LongType)))
    spark.read.schema(schema).parquet(reportDir).drop(MetricsStore.BatchCol)
  }
}
