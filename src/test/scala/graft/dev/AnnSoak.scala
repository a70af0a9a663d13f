package graft.dev

import org.apache.spark.sql.functions._

/** Dev-only soak for the segmented ANN store with compaction: N
  * micro-batches through the REAL applyIvfBatch, recording per-trigger
  * wall, live segment count, store bytes and probe identity — the
  * evidence that (a) per-trigger publish stays O(batch), (b) the live
  * segment count is BOUNDED by maxSegments (round-12: it previously
  * grew without limit below the drift threshold), and (c) drift
  * accounting survives compaction (streamed count equals the sum of
  * everything appended, never reset by a fold).
  *
  * Usage: sbt "Test/runMain graft.dev.AnnSoak [sfDir] [nBatches] [maxSegments]"
  */
object AnnSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(50)
    val maxSegments = args.drop(2).headOption.map(_.toInt).getOrElse(8)
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{IndexStore, Ivf}
    val root = java.nio.file.Files.createTempDirectory("graft_annsoak").toString
    val indexDir = s"$root/index"
    val emb = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val total = emb.count()
    // bootstrap on a third of the corpus; stream the rest in n batches
    val base = emb.where(col("vec_id") % 3 === 0)
    val streamedSrc = emb.where(col("vec_id") % 3 =!= 0).localCheckpoint()
    val built = Ivf.build(base, "vec_id", "embedding", nCentroids = 16)
    IndexStore.saveIvf(spark, built, indexDir)
    println(s"[annsoak] vectors=$total base=${base.count()} batches=$n " +
      s"maxSegments=$maxSegments root=$root")

    def dirBytes(p: String): Long = {
      def walk(x: java.io.File): Long =
        if (x.isDirectory) Option(x.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        else x.length
      val f = new java.io.File(p)
      if (f.exists) walk(f) else 0L
    }
    for (b <- 0 until n) {
      val batch = streamedSrc.where(col("vec_id") % n === b)
      val t0 = System.nanoTime()
      graft.streaming.AnnIngest.applyIvfBatch(batch, b.toLong, indexDir,
        "vec_id", "embedding", maxStreamedFraction = 1.0, maxSegments = maxSegments)
      val wall = (System.nanoTime() - t0) / 1e9
      if (b < 3 || b % 10 == 9 || b == n - 1) {
        val live = IndexStore.liveStreamSegments(spark, indexDir, "assignments")
        val (bn, sn) = IndexStore.componentCounts(spark, indexDir, "assignments")
        println(f"[annsoak] batch=$b%3d wall=$wall%6.2f s liveSegs=$live%3d " +
          f"base=$bn%6d streamed=$sn%6d store=${dirBytes(indexDir) / 1024}%7d KB")
      }
    }
    val live = IndexStore.liveStreamSegments(spark, indexDir, "assignments")
    assert(live <= maxSegments, s"segment count unbounded: $live > $maxSegments")
    val (bn, sn) = IndexStore.componentCounts(spark, indexDir, "assignments")
    assert(sn == streamedSrc.count(),
      s"drift accounting drifted: streamed=$sn expected=${streamedSrc.count()}")
    // probe identity vs one batch extend over everything streamed
    val streamed = IndexStore.loadIvf(spark, indexDir)
    val batchExtended = Ivf.extend(built, streamedSrc, "vec_id", "embedding")
    val queries = emb.where(col("vec_id") < 8)
    // tiny result set (8 queries x k=10): compare driver-side —
    // exceptAll over the probe's windowed plan trips a Spark binding
    // bug (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND on the pruned sim col)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val a = rows(Ivf.probe(streamed._1, streamed._2, queries, "vec_id",
      "embedding", k = 10, nProbe = 4))
    val bres = rows(Ivf.probe(batchExtended._1, batchExtended._2, queries,
      "vec_id", "embedding", k = 10, nProbe = 4))
    println(s"[annsoak] liveSegs=$live streamed=$sn probeIdentical=${a == bres} (must be true)")
    spark.stop()
    assert(a == bres)
  }
}
