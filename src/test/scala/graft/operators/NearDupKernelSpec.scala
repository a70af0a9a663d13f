package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables

/** The broadcast all-pairs kernel in [[Similarity.nearDupPairs]] must
  * be indistinguishable from the crossJoin formulation it replaces —
  * bit-for-bit, including the null/length edge semantics the dot
  * expression defines.
  */
class NearDupKernelSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select($"id_a", $"id_b", $"sim").as[(Long, Long, Double)].collect()
      .sortBy(r => (r._1, r._2)).toSeq

  test("kernel ≡ crossJoin on the fixture embeddings, bit-for-bit") {
    val emb = Tables.embeddings(spark, sf)
    val kernel = canon(Similarity.nearDupPairs(emb, "vec_id", "embedding", tau = 0.4))
    val cross = canon(Similarity.nearDupPairs(emb, "vec_id", "embedding", tau = 0.4,
      maxKernelElements = 0))
    assert(kernel.nonEmpty, "fixture should produce near-dup pairs at tau=0.4")
    assert(kernel == cross, s"kernel diverged: ${kernel.size} vs ${cross.size} rows")
  }

  test("kernel ≡ crossJoin on null vectors, null elements, mixed lengths, dup ids") {
    // two 2-dim near-dups, a 3-dim pair, a null vector, a vector with a
    // null ELEMENT, and a duplicated id — every edge the dot semantics
    // define (null poisons, lengths are per-pair, dup ids never pair)
    val df = spark.sql("""
      SELECT * FROM VALUES
        (1L, array(1.0D, 0.0D)),
        (2L, array(0.9D, 0.1D)),
        (3L, array(1.0D, 0.0D, 0.0D)),
        (4L, array(0.8D, 0.0D, 0.2D)),
        (5L, CAST(NULL AS ARRAY<DOUBLE>)),
        (6L, array(1.0D, CAST(NULL AS DOUBLE))),
        (7L, array(0.0D, 1.0D)),
        (7L, array(0.5D, 0.5D))
      AS t(vec_id, embedding)
    """)
    val kernel = canon(Similarity.nearDupPairs(df, "vec_id", "embedding", tau = 0.1))
    val cross = canon(Similarity.nearDupPairs(df, "vec_id", "embedding", tau = 0.1,
      maxKernelElements = 0))
    assert(kernel == cross,
      s"edge-case divergence: kernel=$kernel cross=$cross")
    // sanity: the 2-dim pair and the 3-dim pair both surface, nothing
    // involving ids 5/6 does, and (7,7) never pairs
    assert(kernel.exists(r => r._1 == 1 && r._2 == 2))
    assert(kernel.exists(r => r._1 == 3 && r._2 == 4))
    assert(kernel.forall(r => r._1 != 5 && r._2 != 5 && r._1 != 6 && r._2 != 6))
    assert(kernel.forall(r => r._1 != r._2))
  }

  test("non-bigint ids fall back to the crossJoin path (schema contract)") {
    val df = spark.sql("""
      SELECT * FROM VALUES
        (1, array(1.0D, 0.0D)), (2, array(0.9D, 0.1D))
      AS t(vec_id, embedding)
    """)
    val out = Similarity.nearDupPairs(df, "vec_id", "embedding", tau = 0.1)
    // int ids stay int — the kernel (which emits longs) must not engage
    assert(out.schema("id_a").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(out.count() == 1)
  }
}
