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
  * `raw/<BatchCol>=<id>/<partitionCol>=<v>/` tree, so a foreachBatch
  * replay (crash in either window: after landing before refresh, or
  * after refresh before the checkpoint commit) rewrites the same bytes
  * and the refresh recomputes the same partitions to the same result.
  * The nested layout matters at scale: the refresh filters raw on the
  * touched partitions, and the `<partitionCol>=` subdirectories let
  * that filter prune directories — a 3-day backfill reads 3 days of
  * every landed batch, not the whole history. Raw reads drop the
  * `__batch` column before the caller's aggregation sees it.
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
      checkpoint: String)(agg: DataFrame => DataFrame): StreamingQuery = {
    // one-time (per stream start) layout audit: a raw store written by
    // a flat landing (files directly under __batch=N/) cannot be read
    // together with the sub-partitioned layout — Spark's partition
    // discovery throws an opaque 'Conflicting directory structures'
    // on EVERY trigger. Name the state up front instead.
    var layoutChecked = false
    def assertLayout(spark: org.apache.spark.sql.SparkSession): Unit =
      if (!layoutChecked) {
        val root = new org.apache.hadoop.fs.Path(rawDir)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(root)) {
          val flat = fs.listStatus(root)
            .filter(st => st.isDirectory && st.getPath.getName.startsWith(BatchCol + "="))
            .flatMap(st => fs.listStatus(st.getPath))
            .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          require(flat.isEmpty,
            s"$rawDir contains flat-layout batches (parquet files directly under " +
              s"$BatchCol= dirs, e.g. ${flat.headOption.map(_.getPath).getOrElse("")}) — " +
              s"written before the $partitionCol-sub-partitioned landing. Mixed " +
              "depths break Spark partition discovery; migrate the old batches " +
              s"(rewrite each with partitionBy($partitionCol)) or start a fresh rawDir.")
        }
        layoutChecked = true
      }
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // one evaluation of the micro-batch source: the empty check,
        // the landing write, and the refresh's touched-set collect
        // all read the cached rows, not the input files three times
        batch.persist()
        try {
          if (!batch.isEmpty) {
            val spark = batch.sparkSession
            assertLayout(spark)
            // deterministic per-batch landing, sub-partitioned by the
            // aggregate's partition column so the refresh's touched-day
            // filter DIRECTORY-PRUNES the raw history (without it every
            // trigger's raw read is O(total history)); replays
            // overwrite the same __batch dir in place
            batch.write.mode("overwrite").partitionBy(partitionCol)
              .parquet(s"$rawDir/$BatchCol=$batchId")
            // explicit schema: partition columns take the STREAM's
            // types (dir-name inference would re-type a string day as
            // DATE and drift the store schema batch-to-batch)
            val rawSchema = org.apache.spark.sql.types.StructType(
              batch.schema.fields :+
                org.apache.spark.sql.types.StructField(
                  BatchCol, org.apache.spark.sql.types.LongType))
            val raw = spark.read.schema(rawSchema).parquet(rawDir).drop(BatchCol)
            IncrementalAgg
              .refresh(spark, raw, batch, aggDir, partitionCol)(agg)
              .get // surface refresh failures to the stream (retry/restart)
          }
        } finally batch.unpersist()
        ()
      }
      .start()
  }
}
