package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** Fixed-round min-label propagation: hop-bounded semantics on a path
  * graph (the slowest-contracting topology), component convergence,
  * and the in-loop storage discipline.
  */
class LabelPropSpec extends SparkTestBase {

  import spark.implicits._

  private def labelsOf(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val df = edges.toDF("u", "v")
    val out = LabelProp.propagate(df, rounds)
    val m = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Lineage.release(out)
    m
  }

  test("one round reaches exactly the 1-hop minimum on a path graph") {
    // path 1-2-3-4-5: after one round node k sees min(k-1, k, k+1)
    val m = labelsOf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), rounds = 1)
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("labels are min-within-k-hops, so 2 rounds reach 2 hops, not 4") {
    val m = labelsOf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), rounds = 2)
    // exact synchronous semantics: l2(5) = min(l1(5), l1(4)) = min(4, 3) = 3
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
  }

  test("enough rounds converge every component to its min node id") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L))
    val m = labelsOf(edges, rounds = 5)
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("isolated self-loop keeps its own label; duplicate edges harmless") {
    val m = labelsOf(Seq((7L, 7L), (1L, 2L), (2L, 1L), (1L, 2L)), rounds = 2)
    assert(m == Map(7L -> 7L, 1L -> 1L, 2L -> 1L))
  }

  test("at convergence (rounds >= diameter) labels agree with Components on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 20 + trial * 10
      // sparse random graph: ~n edges, node ids offset per trial so
      // labels can't accidentally match across trials
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong + trial * 100,
        rnd.nextInt(n).toLong + trial * 100)).distinct
      val lp = labelsOf(edges, rounds = 12) // >> the sparse-random diameter (deterministic seed)
      val cc = Components
        .connectedComponents(edges.toDF("u", "v"), "u", "v")
        .as[(Long, Long)].collect().toMap
      // Components labels by min node id per component; fully-converged
      // min-label propagation must produce the identical map
      assert(lp == cc, s"trial $trial: label prop and CC disagree")
    }
  }

  test("no checkpoint blocks survive after releasing the result") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = LabelProp.propagate(Seq((1L, 2L), (2L, 3L)).toDF("u", "v"), rounds = 3)
    out.collect()
    Lineage.release(out, blocking = true)
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before,
      s"leaked persistent RDDs: before=$before after=$after")
  }
}
