package graft.load

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten pass: keys vanish from every target, others
  * survive, reports audit the drop, failures keep previous contents,
  * reruns converge (idempotent).
  */
class ForgetSpec extends SparkTestBase {
  import spark.implicits._

  test("keys vanish from every target; audit reports per table; rerun is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft_forget").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("user_id", "v").write.parquet(s"$root/events")
    Seq((2L, 10.0), (5L, 20.0))
      .toDF("uid", "amount").write.parquet(s"$root/purchases")

    val keys = Seq(2L, 3L, 99L).toDF("k") // 99 hits nothing anywhere
    val r = Forget.forgetKeys(spark, keys,
      Seq((s"$root/events", "user_id"), (s"$root/purchases", "uid")))
    assert(r.isSuccess, s"got $r")
    val Seq(ev, pu) = r.get
    assert(ev.rowsBefore == 4 && ev.rowsAfter == 2 && ev.dropped == 2)
    assert(pu.rowsBefore == 2 && pu.rowsAfter == 1 && pu.dropped == 1)
    assert(spark.read.parquet(s"$root/events").select("user_id")
      .as[Long].collect().toSet == Set(1L, 4L))
    assert(spark.read.parquet(s"$root/purchases").select("uid")
      .as[Long].collect().toSet == Set(5L))

    // idempotent: a second pass drops nothing and still succeeds
    val r2 = Forget.forgetKeys(spark, keys,
      Seq((s"$root/events", "user_id"), (s"$root/purchases", "uid")))
    assert(r2.isSuccess && r2.get.forall(_.dropped == 0))
  }

  test("a failing target aborts the pass; earlier targets stay purged, failed one intact") {
    val root = java.nio.file.Files.createTempDirectory("graft_forget2").toString
    Seq((1L, "a"), (2L, "b")).toDF("user_id", "v").write.parquet(s"$root/t1")
    val keys = Seq(1L).toDF("k")
    val r = Forget.forgetKeys(spark, keys,
      Seq((s"$root/t1", "user_id"), (s"$root/missing", "user_id")))
    assert(r.isFailure, "missing second target must fail the pass")
    // first target was already purged (sequential, documented); rerun
    // with the fixed list converges
    assert(spark.read.parquet(s"$root/t1").count() == 1)
  }

  test("partition-scoped deletion rewrites ONLY partitions containing hits") {
    val root = java.nio.file.Files.createTempDirectory("graft_forget_p").toString
    val dir = s"$root/facts"
    Seq((1L, "2024-01-01", "a"), (2L, "2024-01-01", "b"),
        (3L, "2024-01-02", "c"), (4L, "2024-01-03", "d"))
      .toDF("user_id", "day", "v")
      .write.partitionBy("day").parquet(dir)
    val untouched = new java.io.File(s"$dir/day=2024-01-03")
      .listFiles().map(f => f.getName -> f.lastModified).toMap

    val r = Forget.forgetKeysPartitioned(spark, Seq(1L).toDF("k"),
      dir, "user_id", "day")
    assert(r.isSuccess, s"got $r")
    assert(r.get.rowsBefore == 4 && r.get.rowsAfter == 3 && r.get.dropped == 1)
    assert(spark.read.parquet(dir).select("user_id")
      .as[Long].collect().toSet == Set(2L, 3L, 4L))
    // the hit-free partition's files were not rewritten
    val after = new java.io.File(s"$dir/day=2024-01-03")
      .listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(after == untouched, "partition without hits must keep its exact files")

    // no hits anywhere: report says zero dropped, nothing rewritten
    val r2 = Forget.forgetKeysPartitioned(spark, Seq(99L).toDF("k"),
      dir, "user_id", "day")
    assert(r2.isSuccess && r2.get.dropped == 0)
  }

  test("a partition whose rows are ALL forgotten is removed, not silently kept") {
    val root = java.nio.file.Files.createTempDirectory("graft_forget_e").toString
    val dir = s"$root/facts"
    Seq((1L, "2024-01-01", "a"), (1L, "2024-01-02", "b"), (2L, "2024-01-02", "c"))
      .toDF("user_id", "day", "v")
      .write.partitionBy("day").parquet(dir)
    // day=2024-01-01 contains ONLY user 1 — deleting user 1 empties it
    val r = Forget.forgetKeysPartitioned(spark, Seq(1L).toDF("k"), dir, "user_id", "day")
    assert(r.isSuccess, s"got $r")
    assert(r.get.rowsBefore == 3 && r.get.rowsAfter == 1 && r.get.dropped == 2)
    assert(spark.read.parquet(dir).select("user_id").as[Long].collect().toSeq == Seq(2L))
    assert(!new java.io.File(s"$dir/day=2024-01-01").exists(),
      "emptied partition's old files must be gone — silent survival is the GDPR failure mode")
  }

  test("partition names survive values that type inference would re-render") {
    val root = java.nio.file.Files.createTempDirectory("graft_forget_t").toString
    val dir = s"$root/facts"
    // '01' would read back as int 1 under partition-type inference —
    // the derived drop name 'day=1' then matches no directory and the
    // emptied partition's files silently survive
    Seq((1L, "01", "a"), (2L, "02", "b"))
      .toDF("user_id", "day", "v")
      .write.partitionBy("day").parquet(dir)
    assert(new java.io.File(s"$dir/day=01").exists(), "fixture wrote zero-padded dir")
    val r = Forget.forgetKeysPartitioned(spark, Seq(1L).toDF("k"), dir, "user_id", "day")
    assert(r.isSuccess, s"got $r")
    assert(r.get.dropped == 1)
    assert(!new java.io.File(s"$dir/day=01").exists(),
      "emptied zero-padded partition must be dropped by its on-disk name")
    assert(new java.io.File(s"$dir/day=02").exists(), "untouched partition intact")
    assert(spark.read.parquet(dir).select("user_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("null partition values are purged null-safely") {
    val root = java.nio.file.Files.createTempDirectory("graft_forget_n").toString
    val dir = s"$root/facts"
    Seq((1L, Some("2024-01-01"), "a"), (2L, Option.empty[String], "b"),
        (3L, Option.empty[String], "c"))
      .toDF("user_id", "day", "v")
      .write.partitionBy("day").parquet(dir)
    val r = Forget.forgetKeysPartitioned(spark, Seq(2L).toDF("k"), dir, "user_id", "day")
    assert(r.isSuccess, s"got $r")
    assert(r.get.dropped == 1, s"null-partition row must be dropped: ${r.get}")
    assert(spark.read.parquet(dir).select("user_id")
      .as[Long].collect().toSet == Set(1L, 3L))
  }

  test("csv targets read with the writer's own header/quoting options") {
    val root = java.nio.file.Files.createTempDirectory("graft_forget_c").toString
    val dir = s"$root/t"
    assert(Load.replaceTable(spark,
      Seq((1L, "keep"), (2L, "drop")).toDF("user_id", "v"), dir, format = "csv").isSuccess)
    val r = Forget.forgetKeys(spark, Seq(2L).toDF("k"),
      Seq((dir, "user_id")), format = "csv")
    assert(r.isSuccess, s"got $r")
    assert(r.get.head.dropped == 1)
  }

  test("catalog tables purge through the staged rename swap") {
    val t = "forget_cat_t"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("user_id", "v")
      .write.saveAsTable(t)
    val r = Forget.forgetKeysCatalog(spark, Seq(1L, 3L).toDF("k"), Seq((t, "user_id")))
    assert(r.isSuccess, s"got $r")
    assert(r.get.head.dropped == 2)
    assert(spark.table(t).select("user_id").as[Long].collect().toSeq == Seq(2L))
    // idempotent rerun
    val r2 = Forget.forgetKeysCatalog(spark, Seq(1L, 3L).toDF("k"), Seq((t, "user_id")))
    assert(r2.isSuccess && r2.get.head.dropped == 0)
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("multi-column key frame is rejected loudly") {
    val root = java.nio.file.Files.createTempDirectory("graft_forget3").toString
    Seq((1L, "a")).toDF("user_id", "v").write.parquet(s"$root/t")
    val bad = Seq((1L, 2L)).toDF("k1", "k2")
    assert(Forget.forgetKeys(spark, bad, Seq((s"$root/t", "user_id"))).isFailure)
  }

  test("forget pass over a LIVE streaming upsert table: purged, lock-serialized, stream continues") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams
    val root = java.nio.file.Files.createTempDirectory("graft_forget_stream").toString
    val table = s"$root/table"
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, String)]
    // ingest filters through the blocklist so erased subjects cannot
    // RE-ENTER after the pass — the pairing the scaladoc demands. A
    // CATALOG table: appends refresh the file index, so the running
    // stream picks up new erasure requests without a restart (a bare
    // parquet-path frame pins its file listing at creation).
    spark.sql("DROP TABLE IF EXISTS forget_blocklist")
    Seq.empty[Long].toDF("k").write.saveAsTable("forget_blocklist")
    val filtered = EventStreams.withoutBlocklisted(
      mem.toDF().toDF("k", "ts", "seq", "v"), spark.table("forget_blocklist"), "k")
    val q = EventStreams.keyedUpsertSink(
      filtered, keyCol = "k", tsCol = "ts", seqCol = "seq",
      tableDir = table, checkpointDir = s"$root/ckpt", buckets = 8)
    try {
      val b = (k: Long) => EventStreams.bucketOfKey(spark, k, 8)
      val (keep, forget) = (7L, (8L to 64L).find(b(_) != b(7L)).get)
      mem.addData((keep, 10L, 0L, "keep"), (forget, 10L, 0L, "secret"))
      q.processAllAvailable()

      def files(bucket: Int): Map[String, (Long, Long)] = {
        val d = new java.io.File(s"$table/__kp=$bucket")
        if (!d.exists()) Map.empty
        else d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> ((f.length, f.lastModified))).toMap
      }
      val keepFilesBefore = files(b(keep))

      // erase while the stream is up (idle between batches): the pass
      // takes the same writer lock the micro-batch publish takes
      Seq(forget).toDF("k").write.mode("append").saveAsTable("forget_blocklist")
      val r = Forget.forgetKeysUpsert(spark, Seq(forget).toDF("k"), table, "k")
      assert(r.isSuccess, s"got $r")
      assert(r.get.dropped == 1)
      assert(spark.read.parquet(table).select($"k").as[Long].collect().toSeq == Seq(keep))
      // only the forgotten key's bucket was touched; the emptied bucket
      // directory is gone, not silently kept
      assert(files(b(keep)) == keepFilesBefore)
      assert(files(b(forget)).isEmpty)

      // the stream keeps running and the erased subject cannot re-enter
      // through it (blocklist filter), while others still upsert
      mem.addData((keep, 20L, 0L, "keep2"), (forget, 20L, 0L, "re-entry"))
      q.processAllAvailable()
      assert(spark.read.parquet(table).select($"k", $"v").as[(Long, String)]
        .collect().toMap == Map(keep -> "keep2"))

      // lock contention is LOUD: a concurrent holder fails the pass
      graft.load.Load.withLock(spark, table, "someone else") {
        assert(Forget.forgetKeysUpsert(spark, Seq(keep).toDF("k"), table, "k").isFailure)
      }.get
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS forget_blocklist") }
  }
}
