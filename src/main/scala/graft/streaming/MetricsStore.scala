package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.IncrementalAgg

/** Streaming maintenance of a partitioned metrics store — the
  * composition that closes the loop between the stream and
  * [[IncrementalAgg]]: each micro-batch lands in the raw table, then
  * ONLY the partitions the batch touched are re-aggregated (from the
  * full raw, so replays cannot double-count) and published through the
  * per-partition staged swap. A 3-day late backfill updates 3
  * partitions of a 3 000-day store, not all of them.
  *
  * Exactly-once across crashes: the raw landing is keyed by the
  * micro-batch id — each batch OVERWRITES its own
  * `raw/<BatchCol>=<id>/` directory, so a foreachBatch replay (crash
  * in either window: after landing before refresh, or after refresh
  * before the checkpoint commit) rewrites the same bytes and the
  * refresh recomputes the same partitions to the same result. The
  * batch-id directory becomes a partition column `__batch` on raw
  * reads; aggregations key on their own partition column and never see
  * it unless they select it.
  */
object MetricsStore {

  val BatchCol = "__batch"

  /** Start the maintenance stream.
    *
    * @param events stream to land + aggregate
    * @param rawDir raw landing table (partitioned by [[BatchCol]])
    * @param aggDir partitioned aggregate store (the read surface)
    * @param partitionCol the aggregate's partition column — `agg` must
    *                     be partition-local on it (IncrementalAgg's
    *                     contract; remapping aggs fail loudly there)
    * @param checkpoint   stream checkpoint location
    * @param agg          partition-local aggregation over the raw rows
    */
  def metricsStoreSink(
      events: DataFrame,
      rawDir: String,
      aggDir: String,
      partitionCol: String,
      checkpoint: String)(agg: DataFrame => DataFrame): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          // deterministic per-batch landing: replays overwrite in place
          batch.write.mode("overwrite")
            .parquet(s"$rawDir/$BatchCol=$batchId")
          val raw = spark.read.parquet(rawDir).drop(BatchCol)
          IncrementalAgg
            .refresh(spark, raw, batch, aggDir, partitionCol)(agg)
            .get // surface refresh failures to the stream (retry/restart)
        }
        ()
      }
      .start()
}
