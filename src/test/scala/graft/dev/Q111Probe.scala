package graft.dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: per-stage attribution for q111 (profile) and q150
  * (quantile profile) — the two standing weak-perf rows. Not part of
  * the shipped surface (test tree).
  *
  * Usage: sbt "Test/runMain graft.dev.Q111Probe [sfDir]"
  */
object Q111Probe {
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

    // warm-up (parquet reader + codegen)
    graft.core.Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(count(lit(1))).write.format("noop").mode("overwrite").save()

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }

    for (name <- Seq("q111_profile", "q150_quantile_profile"); rep <- 1 to 2) {
      val q = graft.Registry.byName(name)
      val df = q.run(spark, sfDir)
      timed(s"$name rep$rep") {
        df.write.format("noop").mode("overwrite").save()
      }
      if (sys.env.contains("PROBE_EXPLAIN")) df.explain("formatted")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
