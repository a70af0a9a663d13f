package graft.dev

import org.apache.spark.sql.functions._

/** Dev-only A/B of the triangle fallback lane on a POWER-LAW graph —
  * the round-11 verdict's point that the co-order fixture is the
  * friendly (near-uniform) case. Deterministic Zipf-target multigraph:
  * each vertex i adds m edges to targets drawn rank-proportionally, so
  * low ids become hubs (max degree ~ m·N/ln N).
  *
  * Lanes: (a) canonical u<v orientation, unchunked probe rows;
  * (b) canonical + hub chunking; (c) degree orientation (the
  * documented power-law setting). All three must enumerate the same
  * triangle count; the wall-clock tells the story.
  *
  * Usage: sbt "Test/runMain graft.dev.TriPowerLawAB [nVertices] [m]"
  */
object TriPowerLawAB {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val m = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Zipf via inverse CDF approximation: rank ~ exp(U * ln N) gives
    // P(rank) ∝ 1/rank. xorshift for determinism (same seed every run).
    val edges = spark.range(0, n.toLong * m).select(
      (col("id") / m).cast("long").as("u0"),
      col("id").as("seq"))
      .withColumn("h", abs(hash(col("seq"))).cast("double") / Int.MaxValue)
      .withColumn("v0", least(lit(n - 1L),
        floor(exp(col("h") * math.log(n.toDouble))).cast("long") - 1))
      .where(col("u0") =!= col("v0"))
      .select(least(col("u0"), col("v0")).as("u"), greatest(col("u0"), col("v0")).as("v"))
      .distinct()
      .localCheckpoint()
    val deg = edges.select(explode(array(col("u"), col("v"))).as("x"))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val maxDeg = deg.agg(max(col("d"))).head.getLong(0)
    val nEdges = edges.count()
    // the round-13 auto-probe must pick the degree lane on this graph
    val t0p = System.nanoTime()
    val auto = graft.operators.Triangles.autoDegreeOriented(edges)
    println(f"[plaw] n=$n m=$m edges=$nEdges maxDegree=$maxDeg " +
      f"sqrt(m)=${math.sqrt(nEdges.toDouble)}%.0f autoDegreeOriented=$auto " +
      f"(probe ${(System.nanoTime() - t0p) / 1e9}%.2f s)")

    def timed(tag: String)(f: => Long): Long = {
      val t0 = System.nanoTime(); val r = f
      println(f"[plaw] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  triangles=$r%d")
      r
    }
    // force the fallback (shuffled) lane in every case
    val tA = timed("canonical, unchunked")(
      Triangles2.count(edges, degreeOriented = false, chunk = Int.MaxValue))
    val tB = timed("canonical, chunk=4096")(
      Triangles2.count(edges, degreeOriented = false, chunk = 4096))
    val tC = timed("degree-oriented, chunk=4096")(
      Triangles2.count(edges, degreeOriented = true, chunk = 4096))
    assert(tA == tB && tB == tC, s"lane divergence: $tA / $tB / $tC")
    spark.stop()
  }

  private object Triangles2 {
    def count(edges: org.apache.spark.sql.DataFrame,
        degreeOriented: Boolean, chunk: Int): Long =
      graft.operators.Triangles.trianglesFromAdjacency(
        graft.operators.Triangles.adjacency(edges, degreeOriented),
        broadcastMaxAdjEntries = 0L, maxAdjChunk = chunk).count()
  }
}
