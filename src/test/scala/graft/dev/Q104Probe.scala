package graft.dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: time q104's phases cold with per-stage attribution.
  * Not part of the shipped surface (test tree).
  *
  * Usage: sbt "Test/runMain graft.dev.Q104Probe [sfDir]"
  */
object Q104Probe {
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
        val m = si.taskMetrics
        println(f"[stage] id=${si.stageId}%3d tasks=${si.numTasks}%3d " +
          f"dur=${dur.getOrElse(-1.0)}%6.2f s " +
          f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e9}%6.2f GB " +
          f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e9}%6.2f GB " +
          f"spill=${m.diskBytesSpilled / 1e9}%5.2f GB  ${si.name.take(70)}")
      }
    })

    // warm-up (parquet reader + codegen)
    graft.core.Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(count(lit(1))).write.format("noop").mode("overwrite").save()

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }

    val pairs = graft.core.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2), size(col("ps"))),
          y => struct(x.as("u"), y.as("v"))))))
        .as("e"))
      .select(col("e.u"), col("e.v"))

    timed("pairs count") { println("  n=" + pairs.count()) }
    val q = timed("full q104 plan+exec") {
      graft.operators.Triangles.triangleCounts(pairs)
        .orderBy(col("n_triangles").desc, col("vertex"))
        .limit(10)
    }
    timed("q104 noop write") {
      q.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
