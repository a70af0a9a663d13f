package graft.demo

import org.apache.spark.sql.functions._

/** Dev probe: what partitioning does a repartition+localCheckpoint
  * LogicalRDD actually report, and does a self-join on the partition
  * keys avoid exchanges? Tested with AQE on vs off at checkpoint time.
  */
object CkptPartProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    import spark.implicits._

    def build(aqe: Boolean) = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      val base = (1 to 10000).toDF("id")
        .withColumn("table", col("id") % 3)
        .withColumn("bucket", col("id") % 97)
      val b = base.repartition(col("table"), col("bucket")).localCheckpoint()
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      b
    }

    for (aqe <- Seq(true, false)) {
      val b = build(aqe)
      println(s"=== aqe-at-checkpoint=$aqe ===")
      println("optimizedPlan: " + b.queryExecution.optimizedPlan.getClass.getSimpleName)
      b.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          println("LogicalRDD partitioning: " + l.outputPartitioning)
      }
      val j = b.as("x").join(b.as("y"),
        col("x.table") === col("y.table") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      val plan = j.queryExecution.executedPlan.toString
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).size
      println(s"self-join hash exchanges: $nEx")
      println(plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Join")).mkString("\n"))
    }
    spark.stop()
  }
}
