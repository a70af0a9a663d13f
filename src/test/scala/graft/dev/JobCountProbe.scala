package graft.dev

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Dev-only: run named queries through the noop sink and report how many
  * Spark JOBS each launched (eager checkpoints/counts/collects included)
  * — the evidence `.explain` cannot show for checkpoint-backed loops,
  * where an optimization removes build jobs but leaves the final plan
  * identical (guide §1: measure the thing you changed).
  *
  * Usage: sbt "Test/runMain graft.dev.JobCountProbe [sfDir] <query ...>"
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.tail.toSeq
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    names.foreach { n =>
      val q = graft.Registry.byName(n)
      // stage the build exactly like Bench (outside the counted region):
      // the probe measures what `sec` times, not the prepare
      q.prepare.foreach(p => p(spark, sfDir))
      jobs.set(0)
      val t0 = System.nanoTime()
      val df = q.run(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      graft.operators.Lineage.release(df, blocking = true)
      // listener events are async — give the bus a beat to drain
      // (listenerBus is private[spark]; a short sleep is enough for a
      // dev probe whose jobs have all completed synchronously above)
      Thread.sleep(300)
      println(f"[jobcount] $n%-40s jobs=${jobs.get()}%3d wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
