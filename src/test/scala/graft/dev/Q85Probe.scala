package graft.dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only probe: time q85 cold with per-stage attribution. Not part
  * of the shipped surface (test tree).
  *
  * Usage: sbt "Test/runMain graft.dev.Q85Probe [sfDir]"
  */
object Q85Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield (c - s) / 1e3
        println(f"[stage] id=${si.stageId}%3d tasks=${si.numTasks}%3d " +
          f"dur=${dur.getOrElse(-1.0)}%6.2f s  ${si.name.take(90)}")
      }
    })

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val q = graft.Registry.byName("q85_corpus_pipeline")
    graft.core.Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
      .write.format("noop").mode("overwrite").save()

    time("q85 cold") {
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()
    time("q85 warm") {
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
