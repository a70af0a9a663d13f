package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Partition-shape helpers shared by the operator families. */
object Partitioning {

  /** Widen an under-partitioned source before a CPU-bound per-row
    * stage: a small parquet file is ONE scan partition
    * (`maxPartitionBytes` is a BYTE heuristic), which serializes
    * tokenize/shingle/hash/dot-product work on a single core. Bytes are
    * tiny in that regime, compute is not, so the repartition is pure
    * win; already-wide inputs pass through untouched.
    *
    * The width decision comes from OPTIMIZER STATS (file-listing bytes
    * over `spark.sql.files.maxPartitionBytes` — the same arithmetic the
    * scan planner applies), NOT from `df.rdd.getNumPartitions`: the RDD
    * conversion forces a full physical planning pass that the actual
    * execution then repeats, and for post-shuffle plans it reports the
    * pre-AQE partition count anyway. Consequence of using stats: the
    * helper is only meaningful directly over file scans (where stats
    * are real listing bytes). Post-shuffle/checkpoint inputs carry
    * estimated stats — a huge estimate makes fanOut a no-op (safe), a
    * tiny inherited estimate costs one extra exchange of tiny data
    * (harmless). At the 100 TB design point scans are naturally wide
    * (size ≫ maxPartitionBytes · parallelism) and this is a no-op.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxPartitionBytes = // value may carry a unit suffix ("128MB"/"...b")
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
      catch { case _: Exception => 134217728L }
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // The byte arithmetic assumes the scan planner can SPLIT each file.
    // A large gzip/zstd JSON or CSV file is one scan partition no matter
    // its size — for those, true scan width is the FILE COUNT, and using
    // listing bytes would make fanOut a no-op in exactly the narrow-scan
    // regime it exists to fix. (.snappy.parquet ends in .parquet, so
    // columnar formats with internal compression are untouched; .bz2 is
    // splittable in Hadoop and deliberately absent.)
    val files = df.inputFiles // metadata-only plan walk, no job
    val nonSplittable = files.nonEmpty &&
      Seq(".gz", ".deflate", ".zst", ".snappy", ".lz4", ".br")
        .exists(suf => files.exists(_.endsWith(suf)))
    val estScanPartitions =
      if (nonSplittable) files.length.toLong
      else (estBytes / maxPartitionBytes).toLong + 1
    if (estScanPartitions < target) df.repartition(target) else df
  }

  /** Eagerly materialize `df` hash-partitioned on `keys` such that the
    * checkpointed frame REMEMBERS its partitioning — a downstream
    * self-join (or any join keyed on `keys`) then plans with ZERO
    * per-side exchanges, paying the shuffle once here instead of once
    * per join side.
    *
    * Why AQE must be off for the build: `Dataset.localCheckpoint`
    * captures `executedPlan.outputPartitioning` into the resulting
    * `LogicalRDD`, but under AQE the executed plan is an
    * `AdaptiveSparkPlanExec`, whose `outputPartitioning` reports
    * `UnknownPartitioning` — the hash distribution is silently lost and
    * EnsureRequirements re-shuffles both join sides (measured: 2
    * exchanges with AQE on at build time, 0 with it off; see
    * CkptPartProbe). The AQE-off window covers the WHOLE checkpoint
    * build job — i.e. every upstream transform in `df`'s plan, not
    * just the final repartition — so a build whose upstream join is
    * badly skewed loses AQE's skew splitting for that one job (keep
    * heavy skew-prone work out of the checkpointed plan, or accept the
    * trade). Callers' downstream queries still run under AQE. The
    * build side loses AQE's partition coalescing, which is the point:
    * the fixed `spark.sql.shuffle.partitions` layout is exactly what
    * makes the two join sides co-partitioned.
    */
  def checkpointByKey(df: DataFrame, keys: Column*): DataFrame =
    checkpointKeepingLayout(df.repartition(keys: _*))

  /** Eager localCheckpoint that PRESERVES the plan's existing output
    * partitioning (use when the plan already lands the layout you want
    * — a repartition-then-dedup chain, a groupBy whose grouping keys
    * are the downstream join keys — and [[checkpointByKey]]'s extra
    * repartition would be a redundant shuffle). Same AQE mechanics as
    * [[checkpointByKey]]: the build runs with AQE off because
    * `AdaptiveSparkPlanExec.outputPartitioning` reports Unknown and the
    * checkpoint would forget the layout.
    */
  def checkpointKeepingLayout(df: DataFrame): DataFrame =
    // Serialized per session: the conf swap mutates SESSION-global
    // state, so two overlapping builds could otherwise interleave
    // read-prev/set/restore and (a) leave AQE permanently off, or
    // (b) let one build plan under AQE and silently capture
    // UnknownPartitioning — the exact regression this helper exists
    // to prevent. The lock covers read-prev → build → restore.
    // (Unrelated queries PLANNED concurrently in the window still see
    // AQE off for that window — a documented cost of the session-conf
    // mechanism; there is no public per-query override for this conf.)
    df.sparkSession.synchronized {
      val conf = df.sparkSession.conf
      val prev = conf.get("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.enabled", "false")
      try df.localCheckpoint()
      finally conf.set("spark.sql.adaptive.enabled", prev)
    }
}
