package graft.dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Dev-only A/B for the incremental-probe index-side bloom prefilter:
  * steady-state shape (index = 97% of the corpus PERSISTED to parquet,
  * batch = 3%), probe wall + total shuffle-write bytes with the
  * prefilter on vs off, interleaved rounds.
  *
  * Usage: sbt "Test/runMain graft.dev.ProbePrefilterAB [sfDir]"
  */
object ProbePrefilterAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_scale_r10/sf1")
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val shuffleW = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleW.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    val docs = graft.core.Tables.documents(spark, sfDir)
    val batchPred = col("doc_id") % 32 === 7 // ~3%
    val root = java.nio.file.Files.createTempDirectory("graft_ppab").toString
    graft.operators.SubstringDedup.gramIndex(docs.where(!batchPred), 8)
      .write.parquet(s"$root/index")
    val index = spark.read.parquet(s"$root/index")
    val batch = docs.where(batchPred).localCheckpoint()
    println(s"[ppab] index rows=${index.count()} batch docs=${batch.count()}")
    def run(tag: String, pre: Boolean): Unit = {
      Thread.sleep(1000); shuffleW.set(0L)
      val t0 = System.nanoTime()
      graft.operators.SubstringDedup
        .cleanKeepFirstIncremental(index, batch, 8, indexGramPrefilter = pre)
        .write.format("noop").mode("overwrite").save()
      Thread.sleep(2000)
      println(f"[ppab] $tag wall=${(System.nanoTime() - t0) / 1e9}%7.2f s " +
        f"shuffleWrite=${shuffleW.get / 1e6}%8.1f MB")
    }
    for (r <- 1 to 3) {
      run(s"prefilter OFF #$r", pre = false)
      run(s"prefilter ON  #$r", pre = true)
    }
    spark.stop()
  }
}
