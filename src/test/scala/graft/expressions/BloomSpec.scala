package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.Sketches
import graft.functions.TextFunctions.hash60

/** Bloom filter: no false negatives, bounded false positives at the
  * chosen load, OR-merge partitioning invariance, parameter bound.
  */
class BloomSpec extends SparkTestBase {
  import spark.implicits._

  private val k = 3
  private val b = 16

  private def members = (1 to 1000).map(i => s"member_$i").toDF("x")

  test("every inserted item is found (no false negatives)") {
    val flt = members.agg(Sketches.bloom(hash60($"x"), k, b).as("bf"))
    val missing = members.crossJoin(broadcast(flt))
      .where(!Sketches.bloomMightContain($"bf", hash60($"x"), k, b))
      .count()
    assert(missing == 0, s"$missing members rejected — bloom must never false-negative")
  }

  test("false positives stay near the theoretical rate") {
    val flt = members.agg(Sketches.bloom(hash60($"x"), k, b).as("bf"))
    val outsiders = (1 to 5000).map(i => s"outsider_$i").toDF("x")
    val fp = outsiders.crossJoin(broadcast(flt))
      .where(Sketches.bloomMightContain($"bf", hash60($"x"), k, b))
      .count()
    // n=1000, m=65536, k=3 → fp ≈ (1 - e^(-kn/m))^k ≈ 8.6e-5; allow 50×
    assert(fp <= 25, s"false-positive count $fp implausibly high for this load")
  }

  test("filter is partitioning-invariant (bitwise-OR merge)") {
    def words(parts: Int) = members.repartition(parts)
      .agg(Sketches.bloom(hash60($"x"), k, b)).head.getSeq[Long](0)
    assert(words(1) == words(7))
  }

  test("numHashes * bitsLog2 must fit one 60-bit hash; bitsLog2 bounded") {
    intercept[IllegalArgumentException] {
      BloomAgg(org.apache.spark.sql.graft.ColumnBridge.expression(lit(1L)), 4, 16)
    }
    // bitsLog2 past the cap would wrap the Int word-count shift
    // (1 << 32 == 1) and index past the buffer — rejected at construction
    intercept[IllegalArgumentException] {
      BloomAgg(org.apache.spark.sql.graft.ColumnBridge.expression(lit(1L)), 1, 38)
    }
  }
}
