package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.load.Load
import graft.operators.{IndexStore, Ivf, IvfPq}

/** Structured-Streaming maintenance of a persisted ANN index — the
  * daily-embedding-ingest shape: a PRE-BUILT index (centroids/codebooks
  * trained once by a batch `build`) is extended append-only per
  * micro-batch with frozen centroids ([[Ivf.extend]] /
  * [[IvfPq.extend]]) and republished through [[IndexStore]]'s atomic
  * whole-directory swap. Probes see either the pre-batch or the
  * post-batch index, never a half-extended one.
  *
  * Exactly-once across crashes (the SubstringIngest discipline, one
  * state directory so only one crash window): the applied-batch
  * watermark rides the swap as a sidecar INSIDE the index dir —
  * watermark < batchId replays the extend against the intact old index;
  * watermark >= batchId skips (the publish completed, only the stream
  * checkpoint commit was lost). The whole body runs under
  * [[Load.withLock]] on the index directory — a concurrent writer (a
  * rebuild job, a second stream) is refused loudly.
  *
  * Preconditions: the index must exist (a frozen-centroid extend of
  * nothing is meaningless — bootstrap with `Ivf.build`/`IvfPq.build` +
  * `IndexStore.save*`, which reads as watermark −1); batch ids must be
  * globally unique across the stream (Ivf's documented contract —
  * duplicate ids shadow each other in top-k scoring; replays of the
  * SAME batch are the watermark's job, not this rule's).
  *
  * Recall drift: frozen centroids mean the extend never re-balances
  * cells. The [[Ivf.extend]] scaladoc's recall-floor guidance applies —
  * schedule a periodic batch rebuild when the streamed fraction grows
  * large; this sink is the between-rebuilds path.
  */
object AnnIngest {

  val AppliedBatchFile = "_applied_batch"

  private def appliedBatch(spark: org.apache.spark.sql.SparkSession, dir: String): Long =
    IndexStore.readSidecar(spark, dir, AppliedBatchFile).map(_.trim.toLong).getOrElse(-1L)

  /** Start an IVF-flat ingest stream over `vecs` (idCol + vecCol). */
  def ivfIngestSink(
      vecs: DataFrame, indexDir: String, checkpoint: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyIvfBatch(batch, batchId, indexDir, idCol, vecCol)
      }
      .start()

  /** One IVF micro-batch application — public for the crash-window
    * specs (the SubstringIngest.applyBatch precedent). Idempotent per
    * batchId.
    */
  def applyIvfBatch(
      batch: DataFrame, batchId: Long, indexDir: String,
      idCol: String, vecCol: String): Unit = {
    batch.persist()
    try {
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        Load.withLock(spark, indexDir, s"ivfIngestSink batch=$batchId") {
          if (batchId > appliedBatch(spark, indexDir)) {
            val index = IndexStore.loadIvf(spark, indexDir)
            try {
              val extended = Ivf.extend(index, batch, idCol, vecCol)
              try IndexStore.saveIvf(spark, extended, indexDir,
                Map(AppliedBatchFile -> batchId.toString))
              finally Ivf.release(extended)
            } finally Ivf.release(index)
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
      idCol: String = "vec_id", vecCol: String = "embedding"): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyIvfPqBatch(batch, batchId, indexDir, idCol, vecCol)
      }
      .start()

  /** One IVF-PQ micro-batch application. Idempotent per batchId. */
  def applyIvfPqBatch(
      batch: DataFrame, batchId: Long, indexDir: String,
      idCol: String, vecCol: String): Unit = {
    batch.persist()
    try {
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        Load.withLock(spark, indexDir, s"ivfPqIngestSink batch=$batchId") {
          if (batchId > appliedBatch(spark, indexDir)) {
            val index = IndexStore.loadIvfPq(spark, indexDir)
            try {
              val extended = IvfPq.extend(index, batch, idCol, vecCol)
              try IndexStore.saveIvfPq(spark, extended, indexDir,
                Map(AppliedBatchFile -> batchId.toString))
              finally IvfPq.release(extended)
            } finally IvfPq.release(index)
          }
        }.get
      }
    } finally batch.unpersist()
    ()
  }
}
