package graft.demo

import org.apache.spark.sql.functions._

/** Dev harness for VERDICT r8 task 6: time the PageRank prelude (pair
  * expansion) separately from the iteration loop, and the broadcast
  * vs co-partitioned shuffle branch at a given SF.
  * Usage: Test/runMain graft.demo.PrBench <sfDir>
  */
object PrBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()

    def edges() = {
      val grouped = graft.core.Tables.lineitem(spark, sfDir)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      grouped.select(explode(flatten(transform(col("ps"), (x, i) =>
          transform(slice(col("ps"), i + lit(2), size(col("ps"))),
            y => struct(x.as("u"), y.as("v"))))))
          .as("e"))
        .select(col("e.u"), col("e.v"))
        .distinct()
    }

    // ranks() CONSUMES its arc input's checkpoint blocks, so each
    // (round, branch) stages a fresh edge checkpoint — the prelude is
    // timed alongside for the split
    for (round <- 1 to 3; (tag, bmax) <- Seq(("broadcast", Long.MaxValue), ("shuffle", 0L))) {
      val t0 = System.nanoTime()
      val e = edges().localCheckpoint()
      val tPre = (System.nanoTime() - t0) / 1e9
      val arcs = graft.operators.PageRank.bothDirections(e)
      val t1 = System.nanoTime()
      val r = graft.operators.PageRank.ranks(arcs, iters = 3, broadcastMaxVertices = bmax)
        .orderBy(col("rank").desc, col("vertex")).limit(10)
      r.write.format("noop").mode("overwrite").save()
      val tIter = (System.nanoTime() - t1) / 1e9
      println(f"[prbench] round$round prelude $tPre%.2f s  $tag%-9s iters $tIter%.2f s")
      graft.operators.Lineage.release(r, blocking = true)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
