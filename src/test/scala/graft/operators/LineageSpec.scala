package graft.operators

import graft.SparkTestBase

/** [[Lineage.release]] frees the checkpoint blocks an incremental
  * operator's result pins — the long-lived-driver hygiene contract.
  */
class LineageSpec extends SparkTestBase {
  import spark.implicits._

  private def persistedCount =
    spark.sparkContext.getPersistentRDDs.size

  test("release frees the checkpoint blocks an incremental dedup result pins") {
    val corpus = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "completely unrelated text with no overlap at all"))
      .toDF("doc_id", "text")
    val before = persistedCount
    val pairs = Dedup.minhashLshIncremental(corpus, batch, "doc_id", "text")
    assert(pairs.count() >= 1, "planted duplicate must match")
    assert(persistedCount > before,
      "the incremental path is expected to pin checkpoint blocks while live")
    Lineage.release(pairs)
    assert(persistedCount == before,
      "release must return the block count to its pre-call level")
    // idempotent: releasing again is a no-op, not an error
    Lineage.release(pairs)
  }

  test("release on a checkpoint-free plan is a no-op") {
    val df = Seq(1, 2, 3).toDF("x")
    val before = persistedCount
    Lineage.release(df)
    assert(persistedCount == before)
    assert(df.count() == 3, "a plain plan stays usable after release")
  }
}
