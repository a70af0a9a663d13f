package graft.streaming

import graft.SparkTestBase
import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming metrics-store maintenance: the store converges to the
  * batch aggregate across micro-batches, a late backfill refreshes
  * only its touched partitions, and replayed batches don't
  * double-count.
  */
class MetricsStoreSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def withDay(df: DataFrame): DataFrame =
    df.withColumn("day", to_date($"ts").cast("string"))

  /** Partition-dir discovery infers day= as DATE; normalize back to
    * the aggregate's string type for comparison. */
  private def readStore(dir: String): DataFrame =
    spark.read.parquet(dir).withColumn("day", $"day".cast("string"))

  private def aggFn(raw: DataFrame): DataFrame =
    raw.groupBy($"day", $"event_type")
      .agg(count(lit(1)).as("n"), graft.functions.Exact.sumExact6($"value").as("sum_value"))

  test("store converges to the batch aggregate; late backfill touches only its partitions") {
    val events = withDay(Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value"))
    val early = events.where($"day" < "2024-01-20")
    val late = events.where($"day" >= "2024-01-20")

    val root = java.nio.file.Files.createTempDirectory("graft_mstore").toString
    val (staged, rawDir, aggDir, ckpt) =
      (s"$root/in", s"$root/raw", s"$root/agg", s"$root/ckpt")
    early.repartition(3).write.mode("overwrite").parquet(staged)

    def runStream(): Unit = {
      val streamed = spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2).parquet(staged)
      val q = MetricsStore.metricsStoreSink(streamed, rawDir, aggDir, "day", ckpt)(aggFn)
      try q.processAllAvailable() finally q.stop()
    }
    runStream()
    assertSameRows(readStore(aggDir), aggFn(early))

    // record per-partition file signatures before the backfill
    def fileSig(dir: String): Map[String, Set[String]] = {
      val base = new java.io.File(dir)
      base.listFiles().filter(_.isDirectory).map { p =>
        p.getName -> p.listFiles().map(f => f.getName + ":" + f.length).toSet
      }.toMap
    }
    val before = fileSig(aggDir)

    // late backfill: new files land, stream drains them, only the
    // late days' partitions are rewritten
    late.repartition(2).write.mode("append").parquet(staged)
    runStream()
    assertSameRows(readStore(aggDir), aggFn(events))
    val after = fileSig(aggDir)
    val lateDays = late.select($"day").distinct().as[String].collect()
      .map(d => s"day=$d").toSet
    before.foreach { case (part, sig) =>
      if (!lateDays.contains(part))
        assert(after(part) == sig, s"untouched partition $part was rewritten")
    }
  }

  test("a legacy flat-layout raw store is refused with a named error") {
    val events = withDay(Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value"))
      .where($"day" < "2024-01-03")
    val root = java.nio.file.Files.createTempDirectory("graft_mlegacy").toString
    // simulate a pre-sub-partitioning landing: files directly under __batch=0/
    events.write.mode("overwrite").parquet(s"$root/raw/${MetricsStore.BatchCol}=0")

    val staged = s"$root/in"
    events.write.mode("overwrite").parquet(staged)
    val streamed = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = MetricsStore.metricsStoreSink(
      streamed, s"$root/raw", s"$root/agg", "day", s"$root/ckpt")(aggFn)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg != null && msg.contains("flat-layout"),
      s"expected the named layout refusal, got: $msg")
  }

  test("a replayed batch rewrites its landing in place — no double count") {
    val events = withDay(Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value"))
      .where($"day" < "2024-01-05")
    val root = java.nio.file.Files.createTempDirectory("graft_mreplay").toString
    val (rawDir, aggDir) = (s"$root/raw", s"$root/agg")

    // simulate foreachBatch body running twice for the same batch id
    // (mirrors the sink's landing layout: day-sub-partitioned, typed
    // raw read)
    def body(batchId: Long): Unit = {
      events.write.mode("overwrite").partitionBy("day")
        .parquet(s"$rawDir/${MetricsStore.BatchCol}=$batchId")
      val rawSchema = org.apache.spark.sql.types.StructType(
        events.schema.fields :+ org.apache.spark.sql.types.StructField(
          MetricsStore.BatchCol, org.apache.spark.sql.types.LongType))
      val raw = spark.read.schema(rawSchema).parquet(rawDir)
        .drop(MetricsStore.BatchCol)
      graft.operators.IncrementalAgg
        .refresh(spark, raw, events, aggDir, "day")(aggFn).get
    }
    body(0L)
    val first = readStore(aggDir).collect().map(_.toSeq).sortBy(_.toString)
    body(0L) // crash-replay of the same micro-batch
    val second = readStore(aggDir).collect().map(_.toSeq).sortBy(_.toString)
    assert(first.toSeq == second.toSeq, "replay must be byte-idempotent on the store")
    assertSameRows(readStore(aggDir), aggFn(events))
  }

  // ---- true crash-window recovery through the ENGINE's replay path
  // (not a hand-driven body): fabricate the exact on-disk state each
  // window leaves behind — Structured Streaming wrote offsets/K but
  // crashed before commits/K — restart the same stream, and assert the
  // store lands identical to an uninterrupted run. Two windows:
  //   1. raw landed, refresh never published (agg rolled back);
  //   2. refresh published, checkpoint commit missing (replay over an
  //      already-current store).
  // Mirrors the upsert/changeFeed sinks' crash specs. ----

  private def copyTree(src: String, dst: String): Unit = {
    val s = java.nio.file.Paths.get(src)
    val d = java.nio.file.Paths.get(dst)
    java.nio.file.Files.walk(s).forEach { p =>
      val t = d.resolve(s.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }
  private def deleteTree(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(java.nio.file.Files.delete(_))
  }

  /** Delete commits/<k> AND its Hadoop `.crc` sidecar: a stale crc
    * makes the restarted query's re-commit look like a concurrent
    * writer ("Multiple streaming queries are concurrently using"). */
  private def deleteCommit(root: String, k: Long): Unit =
    Seq(s"$root/ckpt/commits/$k", s"$root/ckpt/commits/.$k.crc").foreach { f =>
      val p = java.nio.file.Paths.get(f)
      if (java.nio.file.Files.exists(p)) java.nio.file.Files.delete(p)
    }

  private def crashWindowFixture(tag: String) = {
    val events = withDay(Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value"))
    val early = events.where($"day" < "2024-01-20")
    val late = events.where($"day" >= "2024-01-20")
    val root = java.nio.file.Files.createTempDirectory(s"graft_mcrash_$tag").toString
    (events, early, late, root)
  }

  private def runStream(staged: String, root: String, schema: org.apache.spark.sql.types.StructType): Unit = {
    val streamed = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 2).parquet(staged)
    val q = MetricsStore.metricsStoreSink(
      streamed, s"$root/raw", s"$root/agg", "day", s"$root/ckpt")(aggFn)
    try q.processAllAvailable() finally q.stop()
  }

  test("crash between raw landing and refresh publish: restart converges the store") {
    val (events, early, late, root) = crashWindowFixture("w1")
    val staged = s"$root/in"
    early.repartition(3).write.mode("overwrite").parquet(staged)
    runStream(staged, root, events.schema)
    // snapshot the store as of the last COMMITTED batch
    copyTree(s"$root/agg", s"$root/agg_snap")

    // phase 2 is ONE file -> exactly one more batch K, so the
    // fabricated crash state (agg reverted to pre-K) is consistent
    late.coalesce(1).write.mode("append").parquet(staged)
    runStream(staged, root, events.schema)
    val reference = readStore(s"$root/agg").collect().map(_.toSeq).sortBy(_.toString).toSeq

    // fabricate window 1: batch K's raw landing exists, offsets/K
    // exists, but commits/K never happened and the refresh never
    // published — revert agg, delete the commit marker
    val commits = new java.io.File(s"$root/ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).map(_.getName.toLong)
    val k = commits.max
    deleteCommit(root, k)
    deleteTree(s"$root/agg")
    copyTree(s"$root/agg_snap", s"$root/agg")

    runStream(staged, root, events.schema) // engine replays batch K
    val recovered = readStore(s"$root/agg").collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(recovered == reference,
      "recovery after a land-but-no-publish crash must produce the identical store")
    assertSameRows(readStore(s"$root/agg"), aggFn(events))
  }

  test("crash between refresh publish and checkpoint commit: replay is idempotent") {
    val (events, early, late, root) = crashWindowFixture("w2")
    val staged = s"$root/in"
    early.repartition(3).write.mode("overwrite").parquet(staged)
    runStream(staged, root, events.schema)
    late.coalesce(1).write.mode("append").parquet(staged)
    runStream(staged, root, events.schema)
    val reference = readStore(s"$root/agg").collect().map(_.toSeq).sortBy(_.toString).toSeq

    // fabricate window 2: everything published, only the commit marker
    // missing — the engine re-runs batch K against an already-current
    // raw + store
    val commits = new java.io.File(s"$root/ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).map(_.getName.toLong)
    val k = commits.max
    deleteCommit(root, k)

    runStream(staged, root, events.schema)
    val recovered = readStore(s"$root/agg").collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(recovered == reference,
      "replaying a fully-published batch must not change the store")
    assertSameRows(readStore(s"$root/agg"), aggFn(events))
  }
}
