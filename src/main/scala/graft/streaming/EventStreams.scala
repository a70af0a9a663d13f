package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming surface over event-shaped data (SURVEY §7.1
  * step 7). Every transform takes a DataFrame that may be either a
  * static table or a `readStream` source — the logic is
  * source-agnostic, which is exactly Spark's batch/stream unification.
  * Specs assert batch↔stream result equality (the Verify harness is
  * batch-only).
  */
object EventStreams {

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  final case class UserCounts(user_id: Long, n_events: Long, n_purchases: Long)

  /** Streaming corpus intake — the streaming face of the batch
    * corpus-prep flow (stateless gate → exact dedup): documents arrive
    * as (doc_id, text, lang, ts), pass a token-count quality gate (one
    * codegen'd projection, no state — further stateless gates compose
    * the same way), and dedup on the canonical content fingerprint with
    * `dropDuplicatesWithinWatermark` — state for a fingerprint is
    * dropped once the watermark passes it, so the dedup memory is
    * bounded by the (horizon × ingest-rate) working set instead of the
    * whole corpus. A re-crawled duplicate INSIDE the horizon is
    * suppressed; one beyond it re-enters (and the batch backfill
    * catches it) — the standard streaming-ingest contract.
    *
    * Survivor pinning: the stream keeps a fingerprint's FIRST-processed
    * row; a plain batch `dropDuplicates` keeps an arbitrary one
    * (partition-order-dependent), so the batch branch picks the
    * earliest (ts, doc_id) instead — deterministic, and equal to the
    * stream whenever it ingests in event-time order. Output schema is
    * the input's (helper columns dropped).
    */
  def corpusIntake(
      docs: DataFrame, minTokens: Int = 5, watermark: String = "1 hour"): DataFrame = {
    import graft.functions.TextFunctions
    val gated = docs
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
      .where(col("n_tokens") >= minTokens)
      .withColumn("fp", TextFunctions.fingerprint(col("text")))
    val deduped =
      if (docs.isStreaming)
        gated.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("fp")
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("fp")).orderBy(col("ts"), col("doc_id"))
        gated.withColumn("_rn", org.apache.spark.sql.functions.row_number().over(w))
          .where(col("_rn") === 1).drop("_rn")
      }
    deduped.drop("n_tokens", "fp")
  }

  /** Tumbling-window counts with a watermark for late data. In a stream,
    * windows finalize `watermark` after their end; in batch the same
    * plan computes the full history.
    */
  def tumblingCounts(events: DataFrame, win: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win), col("event_type"))
      .agg(count(lit(1)).as("n"),
        // exact-decimal sum: raw double sums are addition-order-
        // dependent, so stream and batch (q176's sumExact6) would only
        // agree after rounding (advice r8)
        graft.functions.Exact.sumExact6(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Hopping (sliding) window counts — q176's streaming counterpart:
    * each event lands in win/hop overlapping windows, assigned
    * map-side by window()'s Expand (no self-join), so the state store
    * holds win/hop entries per (bucket, type) and a window finalizes
    * `watermark` after its END like any other windowed aggregate.
    * In batch the identical plan computes the full history (the spec
    * asserts stream ≡ batch).
    */
  def hoppingCounts(
      events: DataFrame,
      win: String = "1 hour",
      hop: String = "15 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win, hop), col("event_type"))
      .agg(count(lit(1)).as("n"),
        // exact-decimal sum: raw double sums are addition-order-
        // dependent, so stream and batch (q176's sumExact6) would only
        // agree after rounding (advice r8)
        graft.functions.Exact.sumExact6(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Gap-based sessions via the built-in session_window — the
    * groupBy-native formulation of the q45 window-function
    * sessionization (a spec asserts the two agree on session counts).
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"), col("n_events"))

  /** Stream-static enrichment join: each event picks up its user's
    * dimension attributes from a STATIC table. The static side is
    * re-read per micro-batch against the current snapshot (Spark's
    * contract for stream-static joins) and is explicitly broadcast —
    * the stream side never shuffles, which is the only sane shape when
    * the stream is the big side. Works unchanged on a static events
    * frame (spec asserts stream ≡ batch).
    */
  def enrichedEvents(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(
      broadcast(userDim).withColumnRenamed("user_id", "dim_user_id"),
      col("user_id") === col("dim_user_id"), "left_outer")
      .drop("dim_user_id")

  /** Stream → keyed materialized view via foreachBatch: every
    * micro-batch folds into a parquet table keeping the LATEST row per
    * key (event-time desc, tiebreak column desc). This is the
    * production upsert-sink pattern for engines without a native MERGE
    * sink: the batch function is transactional per micro-batch (a
    * throw fails the batch and the checkpoint retries it).
    *
    * Scale shape — the table is laid out in `buckets` hash partitions
    * of the key (`__kp = pmod(xxhash64(key), buckets)`), so a
    * micro-batch reads and rewrites ONLY the buckets its keys land in:
    * per-batch I/O is O(touched buckets), not O(table) — the MERGE
    * INTO dataflow expressed through [[graft.load.Load.replacePartitions]]'
    * per-partition staged swap. Buckets untouched by a batch keep
    * byte-identical files (spec-proven). Size `buckets` so one bucket
    * ≈ a few hundred MB at steady state; the count is pinned in a
    * `<dir>__buckets` sidecar at first publish and a restart with a
    * different value fails loudly — a mismatched modulus would prune
    * the WRONG partitions and resurrect stale rows. Readers see `__kp`
    * as an ordinary partition column (select their own columns as
    * usual). Publishes serialize through [[graft.load.Load.withLock]],
    * so a maintenance pass (forget, compaction) can safely run against
    * a LIVE table by taking the same lock.
    */
  def keyedUpsertSink(
      events: DataFrame, keyCol: String, tsCol: String, seqCol: String,
      tableDir: String, checkpointDir: String,
      buckets: Int = DefaultUpsertBuckets): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        upsertPublish(batch.toDF, batchId, keyCol, tsCol, seqCol, tableDir,
          changeDir = None, buckets = buckets)
      }
      .start()

  /** Default key-hash bucket count for [[keyedUpsertSink]] /
    * [[changeFeedSink]] tables. 64 keeps a small table's directory
    * listing trivial while already giving a 64× I/O cut for a batch
    * touching one bucket; a 100 TB table wants enough buckets that one
    * holds a few hundred MB.
    */
  val DefaultUpsertBuckets = 64

  /** Internal partition column of the upsert store (visible to
    * [[graft.load.Forget.forgetKeysUpsert]], which prunes on it). */
  private[graft] val BucketCol = "__kp"

  /** Reader-facing view of a [[keyedUpsertSink]] / [[changeFeedSink]]
    * table: the rows with the store's internal bucket column removed,
    * so downstream consumers see exactly the schema they wrote — the
    * bucketed layout is an implementation detail and must not leak
    * into every reader's select list. Refuses a directory without the
    * sink's bucket pin (it is not an upsert store — reading a foreign
    * table through this helper would silently hide a REAL `__kp`
    * column). Key-predicate reads still prune: a filter on the key
    * column does not prune by itself (the partition column is a hash,
    * not the key), so for point lookups filter on
    * `col(BucketCol) === bucketOfKey(...)` via the raw reader instead.
    */
  def readUpsertTable(
      spark: org.apache.spark.sql.SparkSession, tableDir: String): DataFrame = {
    val pin = new org.apache.hadoop.fs.Path(tableDir + "__buckets")
    val fs = pin.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(pin),
      s"$tableDir has no bucket pin ($pin) — not a table written by " +
        "keyedUpsertSink/changeFeedSink")
    // Two legitimate sink states would otherwise surface as an opaque
    // 'unable to infer schema' / path-not-found from the parquet
    // reader; name them instead. Neither leaves a schema on disk, so an
    // empty DataFrame cannot be constructed — the caller must decide
    // what empty means for its downstream schema.
    val dir = new org.apache.hadoop.fs.Path(tableDir)
    if (!fs.exists(dir))
      throw new IllegalStateException(
        s"$tableDir has a bucket pin but no table directory — the pin landed " +
          "before the first publish (crash between pin rename and the first " +
          "batch's swap). Re-run the stream to initialize the table, or delete " +
          "the pin to treat the path as fresh.")
    val hasBuckets = fs.listStatus(dir).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith(BucketCol + "="))
    if (!hasBuckets)
      throw new IllegalStateException(
        s"$tableDir is a fully-emptied upsert table (pin present, no $BucketCol= " +
          "bucket directories — a forget pass dropped every bucket, a state " +
          "upsertPublish supports). No schema remains on disk; treat the table " +
          "as empty with the schema your pipeline expects.")
    spark.read.parquet(tableDir).drop(BucketCol)
  }

  private def bucketOf(keyCol: String, buckets: Int) =
    pmod(xxhash64(col(keyCol)), lit(buckets.toLong)).cast("int")

  /** Bucket a single key value lands in under the store's layout —
    * for tests and operational debugging ("which directory holds key
    * X?"). Evaluates the same expression the sink uses, so it cannot
    * drift from the layout. xxhash64 is TYPE-sensitive: pass the key
    * with the exact runtime type of the key column.
    */
  private[graft] def bucketOfKey(
      spark: org.apache.spark.sql.SparkSession, key: Any, buckets: Int): Int =
    spark.range(1)
      .select(pmod(xxhash64(lit(key)), lit(buckets.toLong)).cast("int"))
      .head.getInt(0)

  /** Shared micro-batch core of [[keyedUpsertSink]] and
    * [[changeFeedSink]]: guard, merge latest-per-key over the touched
    * buckets only, optionally land the change feed, publish the
    * touched buckets via the partition-level staged swap.
    */
  private def upsertPublish(
      batch: DataFrame, batchId: Long, keyCol: String, tsCol: String,
      seqCol: String, tableDir: String, changeDir: Option[String],
      buckets: Int): Unit = {
    val spark = batch.sparkSession
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(!batch.columns.contains(BucketCol) && !batch.columns.contains("__rn"),
      s"batch must not carry reserved columns $BucketCol/__rn")
    // genuine first-batch = the table path does not exist. Anything
    // else (corrupt table, failed prior swap leaving __old behind)
    // must THROW so the batch fails and retries, not silently reset
    // the accumulated view to this batch's rows.
    val dest = new org.apache.hadoop.fs.Path(tableDir)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // A missing dest is only a genuine first batch when no swap
    // debris exists: if a prior publish failed after moving partitions
    // aside AND its restore failed, treating this batch as first would
    // silently reset the accumulated view to this batch's rows — data
    // loss with no error. Throw so the batch retries/alerts instead.
    if (!fs.exists(dest) &&
        fs.exists(new org.apache.hadoop.fs.Path(tableDir + "__old")))
      throw new IllegalStateException(
        s"$tableDir missing but ${tableDir}__old exists — prior swap failed " +
          "without restore; recover the backup before resuming the stream")
    withLockRetry(spark, tableDir, s"upsert batch=$batchId") {
      // bucket-count pin: written before the first publish, checked on
      // every later one. The layout IS the modulus — changing it
      // between runs silently breaks pruning, so it must fail here.
      val pin = new org.apache.hadoop.fs.Path(tableDir + "__buckets")
      if (fs.exists(pin)) {
        val in = fs.open(pin)
        val raw = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
        val pinned = raw.toIntOption.getOrElse(throw new IllegalStateException(
          s"bucket pin $pin is unreadable (contents: '$raw') — restore it to " +
            "the table's original bucket count before resuming the stream"))
        require(pinned == buckets,
          s"$tableDir was created with $pinned buckets; restarting the sink " +
            s"with $buckets would corrupt the layout — pass buckets = $pinned")
      } else {
        // No pin but a NON-EMPTY dest = a table this sink did not
        // create (e.g. a flat pre-bucketing layout, or a hand-deleted
        // pin over live __kp= dirs). Merging would silently reset the
        // accumulated view to this batch's rows / corrupt the modulus —
        // the exact data-loss mode the guards above exist to prevent.
        if (fs.exists(dest) && fs.listStatus(dest).nonEmpty)
          throw new IllegalStateException(
            s"$tableDir exists with data but has no bucket pin ($pin) — " +
              "it was not created by this sink (or the pin was deleted). " +
              "Migrate it with a one-time bucketed rewrite, or restore the " +
              "pin to the original bucket count, before resuming the stream")
        // tmp + rename: a crash mid-write must leave no (empty) pin
        // behind — an atomic rename either lands the full pin or nothing
        val tmp = new org.apache.hadoop.fs.Path(tableDir + "__buckets__tmp")
        if (fs.exists(tmp)) fs.delete(tmp, false)
        val out = fs.create(tmp, true)
        out.write(buckets.toString.getBytes("UTF-8")); out.close()
        if (!fs.rename(tmp, pin))
          throw new java.io.IOException(s"bucket pin rename to $pin failed")
      }
      val batched = batch.withColumn(BucketCol, bucketOf(keyCol, buckets))
      // ≤ `buckets` values by construction — a driver-bounded collect
      val touched = batched.select(BucketCol).distinct()
        .collect().map(_.getInt(0)).toSeq
      // partition-pruned read: only the buckets this batch touches are
      // scanned (and later rewritten) — per-batch I/O is O(touched).
      // A dest with no bucket dirs is a fully-emptied table (a forget
      // pass can drop every bucket) — reading it would fail schema
      // inference, so it merges like a first batch.
      def hasBuckets = fs.listStatus(dest)
        .exists(_.getPath.getName.startsWith(BucketCol + "="))
      val current =
        if (fs.exists(dest) && touched.nonEmpty && hasBuckets)
          Some(spark.read.parquet(tableDir)
            .where(col(BucketCol).isin(touched.map(Int.box): _*)))
        else None
      val all = current.map(_.unionByName(batched)).getOrElse(batched)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(keyCol)).orderBy(col(tsCol).desc, col(seqCol).desc)
      val latest = all
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1).drop("__rn")
      changeDir.foreach { cd =>
        // the feed must be APPLYABLE downstream: attach the new row's
        // payload to each added/changed key (fingerprints alone cannot
        // reconstruct state). Upsert semantics → no removed rows, so
        // every change row has a payload in `latest`. Keys OUTSIDE the
        // touched buckets cannot change, so the bucket-scoped diff is
        // the full diff.
        // null-safe payload attach: Diff classifies null keys correctly,
        // so the join back must not silently drop them
        val changed = graft.operators.Diff
          .snapshots(current.getOrElse(latest.limit(0)), latest, Seq(keyCol))
          .where(col("status") =!= "unchanged")
          .select(col(keyCol).as("__ck"), col("status"))
        val changes = latest
          .join(changed, latest(keyCol) <=> col("__ck"), "inner")
          .drop("__ck").drop(BucketCol)
        val batchPath = new org.apache.hadoop.fs.Path(s"$cd/batch=$batchId")
        if (!fs.exists(batchPath)) {
          // parquet writes are not atomic: land in a temp dir, then one
          // rename — a crash mid-write leaves only temp debris, never a
          // partial batch dir that the existence check would trust
          val tmpPath = new org.apache.hadoop.fs.Path(s"$cd/__tmp_batch=$batchId")
          if (fs.exists(tmpPath)) fs.delete(tmpPath, true)
          changes.write.parquet(tmpPath.toString)
          if (!fs.exists(batchPath) && !fs.rename(tmpPath, batchPath))
            throw new java.io.IOException(s"publish rename of change log $batchPath failed")
        }
      }
      // upsert semantics never empty a bucket (every touched bucket
      // holds at least this batch's keys), so no drop list is needed
      graft.load.Load.replacePartitions(spark, latest, tableDir, BucketCol).get
    }
    ()
  }

  /** Acquire the table's single-writer lock, waiting out a TRANSIENT
    * holder (a concurrent forget pass over the same table — see
    * [[graft.load.Forget.forgetKeysUpsert]]) instead of throwing into
    * foreachBatch: an exception there TERMINATES the StreamingQuery —
    * there is no automatic per-batch retry — so "fail and let the sink
    * retry" would turn every maintenance pass into an ingestion outage.
    * Only the lock-held refusal is retried; body failures (pin
    * mismatch, swap errors) propagate immediately. Bounded: a crashed
    * holder's stale lock still surfaces as the refusal error after
    * `attempts` x `sleepMs` (default 120 s), with the holder's
    * owner-note in the message for diagnosis.
    */
  private def withLockRetry[T](
      spark: org.apache.spark.sql.SparkSession, tableDir: String,
      owner: String, attempts: Int = 120, sleepMs: Long = 1000)(body: => T): T = {
    var tries = 0
    while (true) {
      graft.load.Load.withLock(spark, tableDir, owner)(body) match {
        case scala.util.Success(t) => return t
        // Typed, not message-matched: a rewording of the refusal text
        // must not turn a maintenance-pass overlap into stream death.
        case scala.util.Failure(_: graft.load.LockHeldException)
            if tries < attempts =>
          tries += 1; Thread.sleep(sleepMs)
        case scala.util.Failure(e) => throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Forget-list enforcement at INGESTION — the streaming face of
    * [[graft.load.Forget]]: after a right-to-be-forgotten pass purges
    * history, erased subjects must not RE-ENTER through live streams.
    * Broadcast anti-join of each micro-batch against the (small)
    * blocklist: the stream side never shuffles, and the blocklist
    * frame is re-evaluated per micro-batch, so pointing it at the
    * forget-keys table picks up new erasure requests without a
    * restart.
    */
  def withoutBlocklisted(
      stream: DataFrame, blocklist: DataFrame, keyCol: String): DataFrame = {
    require(blocklist.columns.length == 1,
      s"blocklist must have exactly one column, got ${blocklist.columns.mkString(", ")}")
    stream.join(
      broadcast(blocklist
        .select(col(blocklist.columns.head).as("__block_key")).distinct()),
      stream(keyCol) === col("__block_key"), "left_anti")
  }

  /** Streaming CDC-OUT: maintain a latest-per-key table like
    * [[keyedUpsertSink]] AND emit a per-batch CHANGE FEED — the rows
    * whose state the batch actually altered ([[graft.operators.Diff]]
    * against the currently published table: `added` / `changed`;
    * `removed` cannot occur under upsert semantics), each carrying
    * `status` plus the NEW row's full payload so a downstream consumer
    * can apply the feed without reading the table. Incremental
    * consumers read `changeDir/batch=N/` instead of re-diffing.
    *
    * Exactly-once change log under foreachBatch's at-least-once
    * contract, by construction rather than by transaction:
    *   - the diff is computed against the PUBLISHED table, so a batch
    *     replayed after its publish diffs as all-unchanged (no rows);
    *   - each batch lands in its own deterministic `batch=N` directory
    *     via write-to-temp + atomic RENAME (a bare parquet write is not
    *     atomic — a crash mid-write would leave a partial directory
    *     that a bare existence check would mistake for a complete log
    *     entry), and an existing directory is SKIPPED — a replay after
    *     the log landed but before the publish recomputes the
    *     identical diff and skips it.
    * Log write precedes the publish: a crash between the two replays
    * into the skip path, never into loss or duplication. The change
    * directory's batch numbering belongs to ONE checkpoint lineage —
    * restarting a stream with a fresh checkpoint against an old
    * changeDir restarts batch ids at 0 and stale dirs would mask new
    * diffs; pair a new checkpoint with a new changeDir.
    */
  def changeFeedSink(
      events: DataFrame, keyCol: String, tsCol: String, seqCol: String,
      tableDir: String, changeDir: String, checkpointDir: String,
      buckets: Int = DefaultUpsertBuckets)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        changeFeedBatch(batch.toDF, batchId, keyCol, tsCol, seqCol, tableDir,
          changeDir, buckets)
      }
      .start()

  /** One micro-batch of [[changeFeedSink]] — separated so the
    * replay-idempotence contract is directly testable. */
  private[streaming] def changeFeedBatch(
      batch: DataFrame, batchId: Long, keyCol: String, tsCol: String,
      seqCol: String, tableDir: String, changeDir: String,
      buckets: Int = DefaultUpsertBuckets): Unit =
    upsertPublish(batch, batchId, keyCol, tsCol, seqCol, tableDir,
      Some(changeDir), buckets)

  /** Streaming SCD2 dimension maintenance: each micro-batch of
    * attribute updates merges into a versioned history table
    * (operators.Scd.merge) published atomically per batch via the
    * staged swap. A batch may carry a key's whole change chain — the
    * merge sequences it by ts and every distinct-ts version lands as
    * history; same-(key, ts) duplicates keep the highest `seqCol`.
    * Replay-safe under foreachBatch's at-least-once contract: updates
    * whose version already exists in the table (same key, valid_from,
    * attrs) are dropped before the merge, so re-delivery of an
    * already-published batch is a no-op instead of tripping the
    * merge's inverted-interval guard. Same first-batch / swap-debris
    * guards as [[keyedUpsertSink]].
    */
  def scd2Sink(
      updates: DataFrame, keyCol: String, attrCols: Seq[String], tsCol: String,
      seqCol: String, tableDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val dest = new org.apache.hadoop.fs.Path(tableDir)
        val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(dest) &&
            fs.exists(new org.apache.hadoop.fs.Path(tableDir + "__old")))
          throw new IllegalStateException(
            s"$tableDir missing but ${tableDir}__old exists — prior swap failed " +
              "without restore; recover the backup before resuming the stream")
        // A micro-batch may carry a key's whole change chain — the merge
        // sequences it by ts, so every distinct-ts version becomes a
        // history row (round-5 semantics; previously only the latest
        // landed). Same-(key, ts) duplicates keep the highest seq — the
        // at-least-once tie policy a replayed source needs.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(keyCol), col(tsCol)).orderBy(col(seqCol).desc)
        val chain = batch.toDF
          .withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1).drop("__rn")
        val history =
          if (fs.exists(dest)) spark.read.parquet(tableDir)
          else // first batch: merge the chains into an empty dimension
            chain.select((Seq(col(keyCol)) ++ attrCols.map(col) :+
              col(tsCol).as("valid_from") :+
              lit(null).cast("timestamp").as("valid_to")): _*).limit(0)
        // Replay guard: a re-delivered batch (publish succeeded, stream
        // died before the checkpoint commit) arrives against the
        // ALREADY-merged table — each of its updates matches an existing
        // version exactly (key, valid_from, attrs) and must be dropped,
        // or the earlier rows of a chain would read as out-of-order
        // writes and wedge the stream on the inverted-interval guard.
        val applied = history.select(
          (col(keyCol).as("__k") +: col("valid_from").as("__vf") +:
            attrCols.map(c => col(c).as(s"__a_$c"))): _*)
        val fresh = chain.join(applied,
          chain(keyCol) === col("__k") && chain(tsCol) === col("__vf") &&
            attrCols.map(c => chain(c) <=> col(s"__a_$c")).reduce(_ && _),
          "left_anti")
        val merged =
          graft.operators.Scd.merge(history, fresh, keyCol, attrCols, tsCol)
        graft.load.Load.replaceTable(spark, merged, tableDir).get
        ()
      }
      .start()

  /** Streaming deduplication: drop repeated event ids arriving within
    * the watermark horizon (exactly the at-least-once → effectively-once
    * ingest guard an LLM-data pipeline needs in front of its sinks).
    * State for an id is dropped once the watermark passes it — bounded
    * memory at any scale.
    */
  def dedupedEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each view event joins the SAME user's
    * purchase events that happen within `horizon` AFTER it (the
    * attribution-join shape). Both sides carry watermarks and the join
    * condition bounds event-time distance, so Spark can expire buffered
    * state once the watermark passes — without the time bound a
    * stream-stream join would buffer both streams forever. Works
    * unchanged on static frames (the spec asserts stream ≡ batch).
    */
  def attributionJoin(
      views: DataFrame, purchases: DataFrame,
      horizon: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    attributionJoinImpl(views, purchases, horizon, watermark, "inner")

  /** Shared body of the inner and left-outer attribution joins — the
    * watermarks, the time-bound condition, and the column contract must
    * stay in lockstep between the two or their semantics silently
    * diverge.
    */
  private def attributionJoinImpl(
      views: DataFrame, purchases: DataFrame,
      horizon: String, watermark: String, joinType: String): DataFrame = {
    val v = views
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    v.join(p,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $horizon"),
        joinType)
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("view_ts"), col("purchase_ts"), col("purchase_value"))
  }

  /** [[attributionJoin]] with LEFT OUTER semantics: every view emits —
    * matched views per purchase as they arrive, UNMATCHED views exactly
    * once with null purchase columns, and only after the watermark has
    * passed `view_ts + horizon` (the engine may emit the null row only
    * once it can prove no future purchase can still match — the
    * canonical stream-stream outer-join state timeout; an early emit
    * would be retracted by a late purchase, which append mode cannot
    * express). Unattributed-view analysis is the funnel-loss side of
    * the attribution question, and needs exactly this shape.
    */
  def attributionJoinOuter(
      views: DataFrame, purchases: DataFrame,
      horizon: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    attributionJoinImpl(views, purchases, horizon, watermark, "left_outer")

  final case class SessionSummary(
      user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long)

  /** Open-session state: O(1) per user regardless of session length —
    * an unbounded event buffer would grow state (and per-batch resort
    * cost) without limit for a user who never pauses. */
  final case class OpenSession(start: Timestamp, last: Timestamp, n: Long)

  /** Custom sessionization with flatMapGroupsWithState: tracks each
    * user's open session as a compact (start, last, n) summary and EMITS
    * a SessionSummary only when a gap larger than `gapMinutes` closes it
    * (zero-or-more outputs per group per batch — the shape
    * mapGroupsWithState can't express). Events are sorted within a
    * batch; cross-batch out-of-order arrivals are not re-sorted
    * (processing-time variant — an event-time production stream would
    * pair this with a watermark and timeout-based closure).
    */
  def completedSessions(events: Dataset[Event], gapMinutes: Int = 30): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionSummary](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          val sorted = batch.toList.sortBy(e => (e.ts.getTime, e.event_id))
          var open = state.getOption.orNull
          val closed = List.newBuilder[SessionSummary]
          sorted.foreach { e =>
            open match {
              case null =>
                open = OpenSession(e.ts, e.ts, 1L)
              case o if e.ts.getTime - o.last.getTime <= gapMs =>
                open = OpenSession(o.start, e.ts, o.n + 1)
              case o =>
                closed += SessionSummary(uid, o.start, o.last, o.n)
                open = OpenSession(e.ts, e.ts, 1L)
            }
          }
          if (open != null) state.update(open)
          closed.result().iterator
      }
  }

  /** Event-time variant of `completedSessions`: pairs the compact
    * open-session state with a watermark + EventTimeTimeout, so an idle
    * session CLOSES when the watermark passes its gap deadline — no
    * successor event needed (the processing-time variant would hold an
    * abandoned session open forever).
    */
  def completedSessionsEventTime(
      events: Dataset[Event], gapMinutes: Int = 30): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionSummary](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val o = state.get
            state.remove()
            Iterator.single(SessionSummary(uid, o.start, o.last, o.n))
          } else {
            val sorted = batch.toList.sortBy(e => (e.ts.getTime, e.event_id))
            var open = state.getOption.orNull
            val closed = List.newBuilder[SessionSummary]
            sorted.foreach { e =>
              open match {
                case null =>
                  open = OpenSession(e.ts, e.ts, 1L)
                case o if e.ts.getTime - o.last.getTime <= gapMs =>
                  open = OpenSession(o.start, e.ts, o.n + 1)
                case o =>
                  closed += SessionSummary(uid, o.start, o.last, o.n)
                  open = OpenSession(e.ts, e.ts, 1L)
              }
            }
            if (open != null) {
              state.update(open)
              state.setTimeoutTimestamp(open.last.getTime + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Arbitrary stateful processing: running per-user counters via
    * mapGroupsWithState (the custom-state path watermarks can't
    * express). State survives across micro-batches.
    */
  def runningUserCounts(events: Dataset[Event]): Dataset[UserCounts] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserCounts, UserCounts](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[UserCounts]) =>
          val prev = state.getOption.getOrElse(UserCounts(uid, 0L, 0L))
          var n = prev.n_events
          var p = prev.n_purchases
          batch.foreach { e =>
            n += 1
            if (e.event_type == "purchase") p += 1
          }
          val next = UserCounts(uid, n, p)
          state.update(next)
          next
      }
  }

  /** Per-type daily-count state for [[countAnomalies]]: the trailing
    * day→count map (bounded to the window width) and the last day a
    * verdict was emitted for.
    */
  final case class DayCounts(days: Map[Long, Long], emittedUpTo: Long)

  final case class DayVerdict(event_type: String, daynum: Long, cnt: Long,
      win_n: Long, win_sum: Long, anomaly: Boolean)

  /** Streaming face of the q170 batch rule: per event type, a day's
    * verdict is emitted once a LATER day's first event closes it, and
    * flags when the count sits more than 3σ from the trailing
    * `window`-day stats — the same pure-integer cross-multiplied test,
    * (n·x−S)² > 9·(n·Q−S²), so the stream and the batch query agree
    * exactly on in-order data (the spec pins it).
    *
    * State is bounded: only the trailing `window` days survive each
    * update, whatever the stream's age. Verdicts are final
    * (append-mode contract): a late event inside the trailing horizon
    * still feeds FUTURE windows, but cannot reopen an emitted day.
    * Days with zero events produce no verdict (they have no row in the
    * batch rule either).
    */
  def countAnomalies(events: Dataset[Event], window: Int = 6, minWin: Int = 3):
      Dataset[DayVerdict] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[DayCounts, DayVerdict](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (tpe: String, batch: Iterator[Event], state: GroupState[DayCounts]) =>
          // UTC epoch day — identical to datediff(to_date(ts), 1970-01-01)
          // under the engine's UTC session, JVM default zone irrelevant
          def dayOf(t: Timestamp): Long = Math.floorDiv(t.getTime, 86400000L)
          val prev = state.getOption.getOrElse(DayCounts(Map.empty, Long.MinValue))
          var days = prev.days
          batch.foreach { e =>
            val dn = dayOf(e.ts)
            days = days.updated(dn, days.getOrElse(dn, 0L) + 1L)
          }
          val maxDay = days.keys.max
          val start =
            if (prev.emittedUpTo == Long.MinValue) days.keys.min
            else prev.emittedUpTo + 1
          val verdicts = (start until maxDay).iterator.flatMap { day =>
            days.get(day).map { x =>
              val win = ((day - window) until day).flatMap(days.get)
              val n = win.size.toLong
              val s = win.sum
              val q = win.map(c => c * c).sum
              DayVerdict(tpe, day, x, n, s,
                n >= minWin && (n * x - s) * (n * x - s) > 9 * (n * q - s * s))
            }
          }.toVector
          state.update(DayCounts(
            days.filter { case (d, _) => d >= maxDay - window }, maxDay - 1))
          verdicts.iterator
      }
  }
}
