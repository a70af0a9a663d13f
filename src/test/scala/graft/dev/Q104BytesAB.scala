package graft.dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Dev-only shuffle-bytes A/B for the q104 fallback attach (round-11
  * verdict #2 evidence): the ROUND-11 lane (raw array<long> adjacency
  * per exploded edge row + array_intersect) vs the packed lane
  * (sorted delta-varint binary + streaming intersect), same fixture,
  * same shuffled_hash shape, stage shuffle-write bytes printed.
  *
  * Usage: sbt "Test/runMain graft.dev.Q104BytesAB [sfDir]"
  */
object Q104BytesAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_scale_r10/sf3")
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val shuffleW = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleW.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val pairs = graft.core.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2), size(col("ps"))),
          y => struct(x.as("u"), y.as("v"))))))
        .as("e"))
      .select(col("e.u"), col("e.v"))
    val adj = graft.operators.Triangles.adjacency(
      graft.operators.Triangles.canonicalEdges(pairs, "u", "v"))
    adj.count() // stage the adjacency outside both measurements

    def run(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      // settle, then measure only this lane's stages
      Thread.sleep(1000)
      shuffleW.set(0L)
      val t0 = System.nanoTime()
      df.select(explode(array(col("a"), col("b"), col("c"))).as("vertex"))
        .groupBy("vertex").agg(count(lit(1)).as("n_triangles"))
        .write.format("noop").mode("overwrite").save()
      Thread.sleep(2000) // let the listener bus drain the final stage
      println(f"[bytes] $tag%-22s wall=${(System.nanoTime() - t0) / 1e9}%7.2f s " +
        f"shuffleWrite=${shuffleW.get / 1e9}%7.2f GB")
    }

    import graft.operators.Triangles.AdjPayload
    def lane(p: AdjPayload.Value) =
      graft.operators.Triangles.trianglesFromAdjacency(
        adj, broadcastMaxAdjEntries = 0L, payload = p)
    // interleaved rounds: this host's hypervisor steal moves minute to
    // minute — alternating lanes keeps the comparison honest
    for (round <- 1 to 3) {
      run(s"arrays+hashset lane #$round")(lane(AdjPayload.Arrays))
      run(s"sorted-merge lane #$round")(lane(AdjPayload.SortedMerge))
      run(s"packed varint lane #$round")(lane(AdjPayload.PackedVarint))
    }
    spark.stop()
  }
}
