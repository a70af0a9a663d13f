package graft.demo

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev probe: does a repartition(dst)+persist edge table keep its hash
  * partitioning through InMemoryTableScan (AQE on), so the per-round
  * label join shuffles only the labels side?
  */
object EdgePartProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    import spark.implicits._

    val edges = (1 to 100000).toDF("src")
      .withColumn("dst", pmod(col("src") * 7919, lit(100000)))
      .repartition(col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    val labels = (1 to 100000).toDF("node").withColumn("label", col("node"))
    val j = edges.join(labels.select(col("node").as("dst"), col("label")), Seq("dst"))
    val plan = j.queryExecution.executedPlan.toString
    val nEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    println(s"hash exchanges in edge join: $nEx (want 1 — labels side only)")
    println(plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("InMemory")).take(8).mkString("\n"))
    spark.stop()
  }
}
