package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Fixed-point PageRank: structural sanity on known graphs plus the
  * property the design exists for — bit-identical results under
  * different partitioning (float PageRank fails this).
  */
class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  private def star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("u", "v")

  test("star graph: center outranks leaves; leaves tie exactly") {
    val r = PageRank.ranks(PageRank.bothDirections(star), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(r.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(r(0L) > r(1L), s"center must outrank leaves: $r")
    assert(Set(r(1L), r(2L), r(3L), r(4L)).size == 1, "leaves must tie bit-exactly")
  }

  test("result is bit-identical under different partitioning") {
    val arcs = PageRank.bothDirections(star)
    val a = PageRank.ranks(arcs.repartition(1), iters = 3)
      .as[(Long, Long)].collect().toMap
    val b = PageRank.ranks(arcs.repartition(7), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b, "fixed-point ranks must not depend on partitioning")
  }

  test("large-|V| shuffle branch is bit-identical to the broadcast branch") {
    val rnd = new scala.util.Random(11)
    val edges = (0 until 300).map { _ =>
      val u = rnd.nextInt(40).toLong; val v = rnd.nextInt(40).toLong
      (math.min(u, v), math.max(u, v))
    }.filter { case (u, v) => u != v }.distinct.toDF("u", "v")
    val arcs = PageRank.bothDirections(edges)
    val bcast = PageRank.ranks(arcs, iters = 5)
    val shuffled = PageRank.ranks(arcs, iters = 5, broadcastMaxVertices = 0L)
    assert(!shuffled.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "forced shuffle branch must not contain a broadcast join")
    assert(bcast.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "default branch on a small graph must broadcast")
    val a = bcast.as[(Long, Long)].collect().toMap
    val b = shuffled.as[(Long, Long)].collect().toMap
    assert(a == b, "shuffle and broadcast branches must be bit-identical")
  }

  test("tracks float PageRank within fixed-point truncation error") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 120).map { _ =>
      val u = rnd.nextInt(20).toLong; val v = rnd.nextInt(20).toLong
      (math.min(u, v), math.max(u, v))
    }.filter { case (u, v) => u != v }.distinct.toDF("u", "v")
    val arcs = PageRank.bothDirections(edges)
    val fixed = PageRank.ranks(arcs, iters = 10)
      .as[(Long, Long)].collect().toMap
    // reference float implementation on the driver
    val arcList = arcs.as[(Long, Long)].collect()
    val verts = arcList.flatMap(t => Seq(t._1, t._2)).distinct
    val deg = arcList.groupBy(_._1).view.mapValues(_.length).toMap
    var r = verts.map(_ -> 1.0 / verts.length).toMap
    for (_ <- 1 to 10) {
      val in = arcList.groupBy(_._2).view
        .mapValues(_.map { case (s, _) => r(s) / deg(s) }.sum).toMap
      r = verts.map(v => v -> (0.15 / verts.length + 0.85 * in.getOrElse(v, 0.0))).toMap
    }
    verts.foreach { v =>
      val f = fixed(v).toDouble / PageRank.Scale
      assert(math.abs(f - r(v)) < 1e-6, s"vertex $v: fixed $f vs float ${r(v)}")
    }
  }
}
