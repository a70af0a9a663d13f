package graft.operators

import graft.SparkTestBase

/** [[Lineage.release]] frees the checkpoint blocks an incremental
  * operator's result pins — the long-lived-driver hygiene contract.
  */
class LineageSpec extends SparkTestBase {
  import spark.implicits._

  // track the specific RDD ids this test's operator registers, NOT a
  // global count: the session is shared across suites and the
  // ContextCleaner GC-drops earlier suites' abandoned blocks
  // ASYNCHRONOUSLY — a count comparison races those drops (observed as
  // a one-in-many-runs suite-order flake, r15)
  private def persistedIds =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("release frees the checkpoint blocks an incremental dedup result pins") {
    val corpus = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "completely unrelated text with no overlap at all"))
      .toDF("doc_id", "text")
    val before = persistedIds
    val pairs = Dedup.minhashLshIncremental(corpus, batch, "doc_id", "text")
    assert(pairs.count() >= 1, "planted duplicate must match")
    val created = persistedIds -- before
    assert(created.nonEmpty,
      "the incremental path is expected to pin checkpoint blocks while live")
    Lineage.release(pairs)
    assert((created & persistedIds).isEmpty,
      "release must free every block the operator registered")
    // idempotent: releasing again is a no-op, not an error
    Lineage.release(pairs)
  }

  test("release on a checkpoint-free plan is a no-op") {
    val df = Seq(1, 2, 3).toDF("x")
    val before = persistedIds
    Lineage.release(df)
    assert((persistedIds -- before).isEmpty)
    assert(df.count() == 3, "a plain plan stays usable after release")
  }
}
