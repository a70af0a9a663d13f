package graft.demo

import graft.Registry

/** Dev tool: dump `explain("formatted")` for the named queries (or all
  * headline queries) so plans can be reviewed for pushdown, broadcast
  * choices, and shuffle counts.
  * Usage: sbt "Test/runMain graft.demo.PlanDump [sfDir] [query ...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else Registry.headlineNames
    val spark = graft.core.Sessions.local(8)
    names.foreach { n =>
      println(s"\n================ $n ================")
      Registry.byName(n).run(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
