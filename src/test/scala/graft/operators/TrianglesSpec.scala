package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Degree-oriented triangle enumeration: exact counts on known graphs,
  * agreement with the naive u<v formulation on a pseudo-random graph
  * (the oracle-equivalence argument, locally), and no double counting.
  */
class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  test("K4: four triangles, every vertex in three") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    val t = Triangles.triangles(e).collect()
    assert(t.length == 4)
    val counts = Triangles.triangleCounts(e)
      .as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("path graph has no triangles; canonicalEdges dedups and drops loops") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    assert(Triangles.triangles(path).count() == 0)
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L)).toDF("a", "b")
    val canon = Triangles.canonicalEdges(messy, "a", "b")
      .as[(Long, Long)].collect().toSet
    assert(canon == Set((1L, 2L), (2L, 3L)))
  }

  test("degree-oriented result equals the naive formulation on a hashed graph") {
    // deterministic pseudo-random graph with hubs (skewed degrees — the
    // case degree orientation exists for)
    val rnd = new scala.util.Random(42) // seeded → deterministic fixture
    val edges = (0 until 400).map { _ =>
      val u = rnd.nextInt(30).toLong
      val v = rnd.nextInt(30).toLong
      (math.min(u, v), math.max(u, v))
    }.filter { case (u, v) => u != v }.distinct.toDF("u", "v")
    val idOriented = Triangles.triangles(edges).count()
    val degOriented = Triangles.triangles(edges, degreeOriented = true).count()
    // naive: wedges on u<v edges closed by a third u<v edge
    val e = edges
    val naive = e.as("e1")
      .join(e.as("e2"), col("e2.u") === col("e1.v"))
      .join(e.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"),
        "leftsemi")
      .count()
    assert(idOriented == naive, s"id-oriented $idOriented vs naive $naive")
    assert(degOriented == naive, s"degree-oriented $degOriented vs naive $naive")
    assert(naive > 0, "fixture graph must actually contain triangles")
    // duplicate input edges must not create duplicate triangles
    assert(Triangles.triangles(edges.unionAll(edges)).count() == naive)
    // the large-graph branch (adjacency too big to broadcast → shuffled
    // hash join) must produce the identical triangle set
    val shuffled = Triangles.triangles(edges, broadcastMaxAdjEntries = 0L)
    assert(shuffled.count() == naive, "shuffle-attach branch diverged")
    val a = Triangles.triangles(edges).select("a", "b", "c")
      .as[(Long, Long, Long)].collect().toSet
    val b = shuffled.select("a", "b", "c").as[(Long, Long, Long)].collect().toSet
    assert(a == b, "broadcast and shuffle branches enumerate different triangles")
  }

  test("adjacency attach is size-gated: broadcast small, shuffle large") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    def hasBroadcast(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin")
    assert(hasBroadcast(Triangles.triangles(e)),
      "small adjacency must broadcast")
    assert(!hasBroadcast(Triangles.triangles(e, broadcastMaxAdjEntries = 0L)),
      "over-threshold adjacency must not broadcast")
  }
}
