package graft.operators

import graft.SparkTestBase

class DecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  private val benchDoc =
    "what is the capital of france the capital of france is paris obviously"
  // shares the 8-gram "what is the capital of france the capital"
  private val contaminated =
    "quiz answers what is the capital of france the capital city question two"
  private val cleanDoc =
    "an unrelated training document about distributed query execution and shuffle planning"

  test("overlaps flags only docs sharing an 8-gram with the benchmark") {
    val corpus = Seq((1L, contaminated), (2L, cleanDoc)).toDF("doc_id", "text")
    val bench = Seq((100L, benchDoc)).toDF("doc_id", "text")
    val got = Decontaminate.overlaps(corpus, bench, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L))
    assert(got(1L) >= 1L)
  }

  test("clean drops flagged docs and keeps the rest") {
    val cacheWasEmpty = spark.sharedState.cacheManager.isEmpty
    val corpus = Seq((1L, contaminated), (2L, cleanDoc)).toDF("doc_id", "text")
    val bench = Seq((100L, benchDoc)).toDF("doc_id", "text")
    val kept = Decontaminate.clean(corpus, bench, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(2L))
    // flagged set rides a localCheckpoint, not persist — no cache leak
    // (guarded: other suites share this session and may hold caches)
    if (cacheWasEmpty) assert(spark.sharedState.cacheManager.isEmpty,
      "clean must not leave cached frames behind")
  }

  test("short docs (< n tokens) never match and never crash") {
    val corpus = Seq((1L, "too short"), (2L, contaminated)).toDF("doc_id", "text")
    val bench = Seq((100L, "also short")).toDF("doc_id", "text")
    assert(Decontaminate.overlaps(corpus, bench, "doc_id", "text").count() == 0)
  }
}
