package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables
import graft.operators.{IndexStore, Ivf, IvfPq}

/** Streaming ANN index maintenance ([[AnnIngest]]): probe results on
  * the stream-extended index equal those on the batch-extended one
  * (stream ≡ batch through the extend + atomic publish path), and
  * replayed micro-batches are byte-level no-ops on the store.
  */
class AnnIngestSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def emb: DataFrame = Tables.embeddings(spark, sf)

  private def fileSig(dir: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).map(f => f.getPath + ":" + f.length).toSet
  }

  test("IVF sink: stream-extended index probes identically to batch-extended") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_annivf").toString
    val (indexDir, ckpt) = (s"$root/index", s"$root/ckpt")
    val base = emb.where($"vec_id" % 3 === 0)
    val d1 = emb.where($"vec_id" % 3 === 1)
    val d2 = emb.where($"vec_id" % 3 === 2)
    // bootstrap: batch build + persist (reads as watermark -1)
    val built = Ivf.build(base, "vec_id", "embedding", nCentroids = 8)
    IndexStore.saveIvf(spark, built, indexDir)

    val toRows = (df: DataFrame) =>
      df.select($"vec_id", $"embedding").as[(Long, Array[Double])].collect().toSeq
    val mem = MemoryStream[(Long, Array[Double])]
    // this fixture deliberately streams 2/3 of the corpus — disable the
    // drift refusal (exercised by its own test below)
    val q = AnnIngest.ivfIngestSink(
      mem.toDF().toDF("vec_id", "embedding"), indexDir, ckpt,
      maxStreamedFraction = 1.0)
    try {
      mem.addData(toRows(d1): _*)
      q.processAllAvailable()
      mem.addData(toRows(d2): _*)
      q.processAllAvailable()
    } finally q.stop()

    // batch path: same base index extended twice in memory
    val batchExtended = Ivf.extend(Ivf.extend(built, d1, "vec_id", "embedding"),
      d2, "vec_id", "embedding")
    val streamed = IndexStore.loadIvf(spark, indexDir)
    val queries = emb.where($"vec_id" < 5)
    assertSameRows(
      Ivf.probe(streamed._1, streamed._2, queries, "vec_id", "embedding", k = 10, nProbe = 4),
      Ivf.probe(batchExtended._1, batchExtended._2, queries, "vec_id", "embedding", k = 10, nProbe = 4))
    assert(streamed._2.count() == emb.count())
    // release EVERYTHING this test persisted (built's assignment table
    // was superseded inside extend; centroids are shared and idempotent
    // to unpersist) — the suite-level storage-hygiene assertions in
    // SimilaritySpec run in the same shared session
    Ivf.release(streamed); Ivf.release(batchExtended); Ivf.release(built)
  }

  test("IVF sink: replay of an applied batch is a byte-level no-op; fresh batch advances") {
    val root = java.nio.file.Files.createTempDirectory("graft_annrep").toString
    val indexDir = s"$root/index"
    val base = emb.where($"vec_id" % 3 === 0)
    val d1 = emb.where($"vec_id" % 3 === 1)
    val d2 = emb.where($"vec_id" % 3 === 2)
    val boot = Ivf.build(base, "vec_id", "embedding", nCentroids = 8)
    IndexStore.saveIvf(spark, boot, indexDir)
    Ivf.release(boot)
    AnnIngest.applyIvfBatch(d1, 0L, indexDir, "vec_id", "embedding",
      maxStreamedFraction = 1.0)
    val sig = fileSig(indexDir)
    // crash after publish, before checkpoint commit → same batch replays
    AnnIngest.applyIvfBatch(d1, 0L, indexDir, "vec_id", "embedding",
      maxStreamedFraction = 1.0)
    assert(fileSig(indexDir) == sig, "replay rewrote the index")
    // a genuinely new batch still applies on top
    AnnIngest.applyIvfBatch(d2, 1L, indexDir, "vec_id", "embedding",
      maxStreamedFraction = 1.0)
    val ix = IndexStore.loadIvf(spark, indexDir)
    assert(ix._2.count() == emb.count())
    Ivf.release(ix)
  }

  test("IVF-PQ sink: stream-extended equals batch-extended; replay no-op") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_annpq").toString
    val (indexDir, ckpt) = (s"$root/index", s"$root/ckpt")
    val base = emb.where($"vec_id" % 2 === 0)
    val d1 = emb.where($"vec_id" % 2 =!= 0)
    val boot = IvfPq.build(base, "vec_id", "embedding", nCentroids = 8)
    IndexStore.saveIvfPq(spark, boot, indexDir)
    IvfPq.release(boot)

    val mem = MemoryStream[(Long, Array[Double])]
    val q = AnnIngest.ivfPqIngestSink(
      mem.toDF().toDF("vec_id", "embedding"), indexDir, ckpt)
    try {
      mem.addData(d1.select($"vec_id", $"embedding")
        .as[(Long, Array[Double])].collect().toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val sig = fileSig(indexDir)
    AnnIngest.applyIvfPqBatch(d1, 0L, indexDir, "vec_id", "embedding")
    assert(fileSig(indexDir) == sig, "replay rewrote the IVF-PQ index")

    val streamed = IndexStore.loadIvfPq(spark, indexDir)
    val batchExtended = IvfPq.extend(
      IvfPq.build(base, "vec_id", "embedding", nCentroids = 8),
      d1, "vec_id", "embedding")
    val queries = emb.where($"vec_id" < 3)
    assertSameRows(
      IvfPq.probe(streamed, queries, "vec_id", "embedding", k = 10, nProbe = 4),
      IvfPq.probe(batchExtended, queries, "vec_id", "embedding", k = 10, nProbe = 4))
    IvfPq.release(streamed); IvfPq.release(batchExtended)
  }

  test("recall drift: a batch pushing the streamed fraction past the threshold is refused before any write; a rebuild resets it") {
    val root = java.nio.file.Files.createTempDirectory("graft_anndrift").toString
    val indexDir = s"$root/index"
    val base = emb.where($"vec_id" % 3 === 0)
    val d1 = emb.where($"vec_id" % 3 === 1)
    val d2 = emb.where($"vec_id" % 3 === 2)
    val boot = Ivf.build(base, "vec_id", "embedding", nCentroids = 8)
    IndexStore.saveIvf(spark, boot, indexDir)
    Ivf.release(boot)
    // batch 0: streamed fraction ~0.5 — allowed at the default 0.5? No:
    // d1 ≈ base, so frac ≈ 0.5 exactly; use a tighter threshold to trip
    val e = intercept[IllegalStateException] {
      AnnIngest.applyIvfBatch(d1, 0L, indexDir, "vec_id", "embedding",
        maxStreamedFraction = 0.3)
    }
    assert(e.getMessage.contains("maxStreamedFraction"), e.getMessage)
    // refusal happened BEFORE any write: no segments landed
    assert(IndexStore.segmentIds(spark, indexDir, "assignments").isEmpty)
    // under the threshold the same batch applies…
    AnnIngest.applyIvfBatch(d1, 0L, indexDir, "vec_id", "embedding",
      maxStreamedFraction = 0.75)
    assert(IndexStore.segmentIds(spark, indexDir, "assignments") == Seq(0L))
    // …and a batch REBUILD (the mandated compaction) resets the
    // fraction: full save with the applied watermark riding the swap
    val ix = IndexStore.loadIvf(spark, indexDir)
    val rebuilt = Ivf.build(ix._2.select($"vid".as("vec_id"), $"v".as("embedding")),
      "vec_id", "embedding", nCentroids = 8)
    IndexStore.saveIvf(spark, rebuilt, indexDir, Map(AnnIngest.AppliedBatchFile -> "0"))
    Ivf.release(ix); Ivf.release(rebuilt)
    assert(IndexStore.segmentIds(spark, indexDir, "assignments").isEmpty)
    // replay of batch 0 against the rebuilt index skips (watermark 0)
    val sig = fileSig(indexDir)
    AnnIngest.applyIvfBatch(d1, 0L, indexDir, "vec_id", "embedding")
    assert(fileSig(indexDir) == sig, "replayed batch was re-applied after rebuild")
    // batch 1 now lands on a fresh base (fraction back under 0.5)
    AnnIngest.applyIvfBatch(d2, 1L, indexDir, "vec_id", "embedding")
    val after = IndexStore.loadIvf(spark, indexDir)
    assert(after._2.count() == emb.count())
    Ivf.release(after)
  }

  test("segment compaction: past maxSegments the live segments fold into one cseg — probe identity, stable watermark, drift accounting preserved, dead parts excluded then swept") {
    val root = java.nio.file.Files.createTempDirectory("graft_anncomp").toString
    val indexDir = s"$root/index"
    val base = emb.where($"vec_id" % 5 === 0)
    val boot = Ivf.build(base, "vec_id", "embedding", nCentroids = 8)
    IndexStore.saveIvf(spark, boot, indexDir)
    Ivf.release(boot)
    val batches = (1 to 4).map(i => emb.where($"vec_id" % 5 === i))
    batches.zipWithIndex.foreach { case (b, i) =>
      AnnIngest.applyIvfBatch(b, i.toLong, indexDir, "vec_id", "embedding",
        maxStreamedFraction = 1.0, maxSegments = 2)
    }
    // maxSegments=2 over 4 batches forces a mid-stream compaction:
    // batch 2's append makes 3 live segments -> cseg_2; batch 3 lands
    // beside it
    assert(IndexStore.liveStreamSegments(spark, indexDir, "assignments") <= 2,
      "segment count not bounded by compaction")
    val ids = IndexStore.segmentIds(spark, indexDir, "assignments")
    assert(ids.max == 3L, s"watermark regressed across compaction: $ids")
    assert(ids.contains(2L), s"live cseg fold-through id missing from $ids")
    // replay of a batch folded INTO the cseg is still a byte-level no-op
    val sig = fileSig(indexDir)
    AnnIngest.applyIvfBatch(batches.head, 0L, indexDir, "vec_id", "embedding",
      maxStreamedFraction = 1.0, maxSegments = 2)
    assert(fileSig(indexDir) == sig, "replay of a compacted batch rewrote the index")
    // drift accounting survives compaction: folded rows stay streamed
    val (b0, s0) = IndexStore.componentCounts(spark, indexDir, "assignments")
    assert(b0 == base.count() && s0 == batches.map(_.count()).sum,
      s"compaction disturbed drift accounting: base=$b0 streamed=$s0")
    // the folded segments LINGER as dead parts (deferred, grace-window
    // deletion); readers must exclude them BY RULE — overwriting one
    // with a garbage schema proves it is never even opened — and the
    // zero-grace sweep removes them
    val deadSeg = new java.io.File(s"$indexDir/assignments/seg_1")
    assert(deadSeg.isDirectory, "expected the folded segment to linger inside the grace window")
    spark.range(3).selectExpr("id AS not_an_assignment_column")
      .write.mode("overwrite").parquet(deadSeg.getPath)
    val streamed = IndexStore.loadIvf(spark, indexDir)
    assert(streamed._2.count() == emb.count(), "dead segment leaked into the view")
    IndexStore.sweepDead(spark, indexDir, "assignments", graceMs = 0)
    assert(!deadSeg.exists(), "sweepDead left the dead segment")
    // probe identity vs the batch-extended index
    val batchExtended = batches.foldLeft(
      Ivf.build(base, "vec_id", "embedding", nCentroids = 8)) { (ix, d) =>
      Ivf.extend(ix, d, "vec_id", "embedding")
    }
    val queries = emb.where($"vec_id" < 5)
    assertSameRows(
      Ivf.probe(streamed._1, streamed._2, queries, "vec_id", "embedding", k = 10, nProbe = 4),
      Ivf.probe(batchExtended._1, batchExtended._2, queries, "vec_id", "embedding", k = 10, nProbe = 4))
    Ivf.release(streamed); Ivf.release(batchExtended)
    // exact id audit: clean through the compactions…
    assert(IndexStore.auditIds(spark, indexDir, "assignments").isEmpty)
    // …and a source re-emitting an already-ingested id (a NEW batch id,
    // so the watermark cannot catch it) is pinned by the audit
    AnnIngest.applyIvfBatch(batches.head.limit(1), 9L, indexDir, "vec_id", "embedding",
      maxStreamedFraction = 1.0, maxSegments = 2)
    val dups = IndexStore.auditIds(spark, indexDir, "assignments").collect()
    assert(dups.length == 1 && dups(0).getLong(1) == 2L,
      s"audit missed the re-emitted id: ${dups.toSeq}")
  }

  test("two-level ANN compaction: minors leave base files and earlier runs untouched; the run-count bound forces a full fold") {
    val root = java.nio.file.Files.createTempDirectory("graft_annfull").toString
    val indexDir = s"$root/index"
    val base = emb.where($"vec_id" % 10 =!= 0) // large base → size-ratio never trips
    val boot = Ivf.build(base, "vec_id", "embedding", nCentroids = 8)
    IndexStore.saveIvf(spark, boot, indexDir)
    Ivf.release(boot)
    val baseSig = fileSig(s"$indexDir/assignments")
      .filter(!_.contains("seg")) // the batch-built files only
    val batches = (0 until 9).map(i =>
      emb.where($"vec_id" % 10 === 0 && ($"vec_id" / 10) % 9 === i))
    for ((b, i) <- batches.zipWithIndex) {
      AnnIngest.applyIvfBatch(b, i.toLong, indexDir, "vec_id", "embedding",
        maxStreamedFraction = 1.0, maxSegments = 2)
      if (i == 5) {
        // after the second minor: two standalone cseg runs live at once
        val ids = IndexStore.segmentIds(spark, indexDir, "assignments")
        assert(ids.contains(2L) && ids.contains(5L), s"expected two minor runs, got $ids")
        assert(new java.io.File(s"$indexDir/assignments/cseg_2").isDirectory)
        assert(new java.io.File(s"$indexDir/assignments/cseg_5").isDirectory)
      }
    }
    // batch 8's fold hit the run-count bound (2 live csegs >= maxRuns)
    // → everything consolidated into one full run
    assert(new java.io.File(s"$indexDir/assignments/fseg_8").isDirectory,
      "expected a full fold at the run-count bound")
    val ids = IndexStore.segmentIds(spark, indexDir, "assignments")
    assert(ids == Seq(8L), s"full fold should leave one live run: $ids")
    // NO fold ever rewrote the batch-built base files
    assert(fileSig(s"$indexDir/assignments").filter(!_.contains("seg")) == baseSig,
      "a streamed-data fold rewrote the batch-built base files")
    // drift accounting exact through minors + the full fold
    val (bn, sn) = IndexStore.componentCounts(spark, indexDir, "assignments")
    assert(bn == base.count() && sn == batches.map(_.count()).sum,
      s"drift accounting drifted: base=$bn streamed=$sn")
    // probe identity vs the batch-extended index
    val streamed = IndexStore.loadIvf(spark, indexDir)
    assert(streamed._2.count() == emb.count())
    val batchExtended = batches.foldLeft(
      Ivf.build(base, "vec_id", "embedding", nCentroids = 8)) { (ix, d) =>
      Ivf.extend(ix, d, "vec_id", "embedding")
    }
    val queries = emb.where($"vec_id" < 5)
    assertSameRows(
      Ivf.probe(streamed._1, streamed._2, queries, "vec_id", "embedding", k = 10, nProbe = 4),
      Ivf.probe(batchExtended._1, batchExtended._2, queries, "vec_id", "embedding", k = 10, nProbe = 4))
    Ivf.release(streamed); Ivf.release(batchExtended)
  }

  test("missing bootstrap index is refused loudly") {
    val root = java.nio.file.Files.createTempDirectory("graft_annmiss").toString
    val e = intercept[IllegalArgumentException] {
      AnnIngest.applyIvfBatch(emb.limit(5), 0L, s"$root/nope", "vec_id", "embedding")
    }
    assert(e.getMessage.contains("not a saved index"), e.getMessage)
  }

  test("retention: compaction death-stamps folded segments — sweepDead's grace runs from the fold commit, not part mtime (advice r12)") {
    val root = java.nio.file.Files.createTempDirectory("graft_annsweep").toString
    val indexDir = s"$root/index"
    val base = emb.where($"vec_id" % 4 === 0)
    val boot = Ivf.build(base, "vec_id", "embedding", nCentroids = 8)
    IndexStore.saveIvf(spark, boot, indexDir)
    Ivf.release(boot)
    // maxSegments=2: batch 2's append makes 3 live segments -> cseg_2
    (1 to 3).foreach { i =>
      AnnIngest.applyIvfBatch(emb.where($"vec_id" % 4 === i), (i - 1).toLong,
        indexDir, "vec_id", "embedding", maxStreamedFraction = 1.0, maxSegments = 2)
    }
    val dead = (0 to 2).map(i => new java.io.File(s"$indexDir/assignments/seg_$i"))
    assert(dead.forall(_.isDirectory), "folded segments should linger")
    val stamps = dead.map(d => new java.io.File(d, IndexStore.DeadAtFile))
    assert(stamps.forall(_.isFile), "compaction did not death-stamp its inputs")
    // parts far older than the grace window, stamps fresh: kept — in
    // steady state a segment is maxSegments triggers old at death, so
    // an mtime-gated sweep would delete it on the very next trigger
    dead.foreach(_.setLastModified(System.currentTimeMillis() - 24L * 3600 * 1000))
    IndexStore.sweepDead(spark, indexDir, "assignments")
    assert(dead.forall(_.isDirectory),
      "sweep deleted a dead part inside the grace window measured from its death stamp")
    // stamps aged past the grace window: collected (drop the .crc
    // sidecar — the stamp was written through Hadoop's checksummed
    // LocalFileSystem and is rewritten here raw)
    stamps.foreach { s =>
      new java.io.File(s.getParentFile, s".${s.getName}.crc").delete()
      java.nio.file.Files.write(s.toPath,
        (System.currentTimeMillis() - 2 * IndexStore.DefaultSweepGraceMs)
          .toString.getBytes("UTF-8"))
    }
    IndexStore.sweepDead(spark, indexDir, "assignments")
    assert(dead.forall(!_.exists()), "sweep left dead parts whose death stamp aged out")
    // an UNSTAMPED dead part (crash between fold rename and stamps) is
    // stamped by the first sweep and collected only after the grace
    val orphan = new java.io.File(s"$indexDir/assignments/seg_0")
    orphan.mkdirs()
    orphan.setLastModified(System.currentTimeMillis() - 24L * 3600 * 1000)
    IndexStore.sweepDead(spark, indexDir, "assignments")
    assert(orphan.isDirectory, "first sweep deleted an unstamped dead part immediately")
    assert(new java.io.File(orphan, IndexStore.DeadAtFile).isFile,
      "first sweep did not stamp the unstamped dead part")
  }
}
