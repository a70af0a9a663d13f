package graft.demo
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = graft.core.Sessions.local(32)
    graft.core.Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    args.tail.foreach { n =>
      (1 to 2).foreach { it =>
        val t0 = System.nanoTime()
        graft.Registry.byName(n).run(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[qbench] $n iter$it ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
