package graft.dev

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Dev-only A/B: q104 triangle counts with canonical vs degree-oriented
  * adjacency at scale — measures whether auto-orientation should kick
  * in once the adjacency outgrows the broadcast gate (round 11; q104's
  * sf10 row came in ~1.5× above linear on the canonical path).
  */
object TriOrientAB {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/tmp/graft_scale_r10/sf3")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[tab] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    Tables.lineitem(spark, d).groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    // coOrderPairs replicated (it is private[queries]; identical shape)
    def pairs = Tables.lineitem(spark, d)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2), size(col("ps"))),
          y => struct(x.as("u"), y.as("v"))))))
        .as("e"))
      .select(col("e.u"), col("e.v"))
    // the round-13 auto-probe must KEEP canonical on this near-uniform
    // co-order graph (max degree far under sqrt(m))
    val canon = graft.operators.Triangles.canonicalEdges(pairs, "u", "v")
    val auto = time("auto-probe")(
      graft.operators.Triangles.autoDegreeOriented(canon))
    println(s"[tab] autoDegreeOriented=$auto (expect false on co-order)")
    for (round <- 1 to 2) {
      time(s"canonical $round")(noop(
        graft.operators.Triangles.triangleCounts(pairs)))
      time(s"degree-oriented $round")(noop(
        graft.operators.Triangles.triangleCounts(pairs, degreeOriented = true)))
    }
    spark.stop()
  }
}
