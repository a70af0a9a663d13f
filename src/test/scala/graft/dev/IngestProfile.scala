package graft.dev

import org.apache.spark.sql.functions._

/** Dev-only profile of the q210/q213 BUILD (the 4-micro-batch streaming
  * fold): splits the wall into staging / per-trigger phases so the
  * optimization target is measured, not guessed (guide §1). Phases per
  * trigger, timed by wrapping the REAL applyBatch sub-steps' public
  * surface: the report probe (cleanKeepFirstIncremental → parquet) and
  * the segment publish (gramIndex → parquet) — the two corpus passes.
  * The residual per-trigger fixed cost (store read, bloom, rename,
  * compaction) is the direct-applyBatch timing minus those two.
  *
  * Usage: sbt "Test/runMain graft.dev.IngestProfile [sfDir] [maxSegments]"
  */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxSegments = args.drop(1).headOption.map(_.toInt)
      .getOrElse(graft.streaming.SubstringIngest.DefaultMaxSegments)
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    val root = java.nio.file.Files.createTempDirectory("graft_prof").toString
    val docs = graft.core.Tables.documents(spark, sfDir)

    // Phase 0: input staging (q210Stage's repartition(4) parquet write)
    t("stage input (4-file drop)") {
      docs.repartition(4).write.mode("overwrite").parquet(s"$root/in")
    }

    // Phase 1-4: the streaming fold, one trigger per file — timed whole
    // via the REAL sink, then re-derived per-phase below on a second
    // fresh store using applyBatch directly (identical code path; the
    // sink adds only stream machinery).
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
    t("TOTAL streaming fold (sink)") {
      val q = graft.streaming.SubstringIngest.substringIngestSink(
        stream, s"$root/index", s"$root/reports", s"$root/ckpt", k = 8,
        maxSegments = maxSegments)
      try q.processAllAvailable() finally q.stop()
    }

    // Second store: drive applyBatch directly with phase instrumentation
    // around its two heavy children, approximated here by running them
    // standalone against the same store state (the cost model, not the
    // commit protocol).
    val root2 = java.nio.file.Files.createTempDirectory("graft_prof2").toString
    val files = new java.io.File(s"$root/in").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    println(s"[profile] ${files.length} input files")
    files.zipWithIndex.foreach { case (f, i) =>
      val batch = spark.read.parquet(f)
      t(s"applyBatch b=$i (direct)") {
        graft.streaming.SubstringIngest.applyBatch(
          batch, i.toLong, s"$root2/index", s"$root2/reports", k = 8,
          maxSegments = maxSegments)
      }
    }

    // Phase decomposition on a third store: time the two heavy
    // sub-plans standalone per batch (report probe vs segment publish)
    val root3 = java.nio.file.Files.createTempDirectory("graft_prof3").toString
    files.zipWithIndex.foreach { case (f, i) =>
      val batch = spark.read.parquet(f)
      batch.persist()
      batch.count()
      if (i == 0) {
        t(s"b=$i gramIndex seg write") {
          graft.operators.SubstringDedup.gramIndex(batch, 8)
            .write.mode("overwrite").parquet(s"$root3/seg_$i")
        }
        t(s"b=$i report (empty live)") {
          val empty = spark.read.parquet(s"$root3/seg_$i").limit(0)
          graft.operators.SubstringDedup.cleanKeepFirstIncremental(empty, batch, 8)
            .write.mode("overwrite").parquet(s"$root3/rep_$i")
        }
      } else {
        val live = (0 until i).map(j => spark.read.parquet(s"$root3/seg_$j"))
          .reduce(_ unionByName _)
        t(s"b=$i report (live=${i} segs)") {
          graft.operators.SubstringDedup.cleanKeepFirstIncremental(live, batch, 8)
            .write.mode("overwrite").parquet(s"$root3/rep_$i")
        }
        t(s"b=$i gramIndex seg write") {
          graft.operators.SubstringDedup.gramIndex(batch, 8)
            .write.mode("overwrite").parquet(s"$root3/seg_$i")
        }
      }
      batch.unpersist()
    }
    spark.stop()
  }
}
