package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.Sketches
import graft.functions.TextFunctions.hash60

/** Count-Min sketch: one-sided error (estimate >= truth), exactness in
  * the collision-free regime, partitioning invariance (mergeable bucket
  * sums), and the depth*widthBits bound.
  */
class CmsSpec extends SparkTestBase {
  import spark.implicits._

  private val depth = 4
  private val wBits = 10

  private def corpus = (1 to 500).flatMap(i => Seq.fill(i % 7 + 1)(s"item_$i"))
    .toDF("x")

  test("estimates are >= true counts, and exact for most items at low load") {
    val sk = corpus.agg(Sketches.countMin(hash60($"x"), depth, wBits).as("sk"))
    val truth = corpus.groupBy($"x").agg(count(lit(1)).as("n"))
    val got = truth.crossJoin(broadcast(sk))
      .select($"x", $"n",
        Sketches.countMinEstimate($"sk", hash60($"x"), depth, wBits).as("est"))
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (x, n, est) =>
      assert(est >= n, s"$x: CMS must never underestimate ($est < $n)")
    }
    // 500 distinct items in 4 rows of 1024 buckets: the min-over-rows
    // estimate should be exact for nearly all items
    val exact = got.count { case (_, n, est) => est == n }
    assert(exact >= got.length * 9 / 10, s"only $exact/${got.length} exact")
  }

  test("sketch is partitioning-invariant (bucket sums merge associatively)") {
    def sketchOf(parts: Int) = corpus.repartition(parts)
      .agg(Sketches.countMin(hash60($"x"), depth, wBits))
      .head.getSeq[Long](0)
    assert(sketchOf(1) == sketchOf(7))
  }

  test("unknown items estimate at collision noise, never negative") {
    val sk = corpus.agg(Sketches.countMin(hash60($"x"), depth, wBits).as("sk"))
    val est = Seq("never_seen").toDF("q").crossJoin(broadcast(sk))
      .select(Sketches.countMinEstimate($"sk", hash60($"q"), depth, wBits))
      .as[Long].head()
    assert(est >= 0)
  }

  test("depth * widthBits must fit one 60-bit hash; widthBits bounded") {
    intercept[IllegalArgumentException] {
      CountMinAgg(org.apache.spark.sql.graft.ColumnBridge.expression(lit(1L)), 7, 10)
    }
    // widthBits past the cap would overflow the Int shift (1 << 31) —
    // rejected at construction, not a NegativeArraySizeException later
    intercept[IllegalArgumentException] {
      CountMinAgg(org.apache.spark.sql.graft.ColumnBridge.expression(lit(1L)), 2, 30)
    }
  }
}
