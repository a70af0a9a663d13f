package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The steady-state substring-dedup ingest loop end-to-end: the gram
  * index persisted as a table (Load.replaceTable), batches probed
  * against it WITHOUT re-tokenizing the corpus, the index folded
  * forward for the next round. Each round's retention report must
  * equal the full recompute over everything-so-far restricted to that
  * round's batch (the q209 invariant, here across TWO storage
  * round-trips).
  */
class SubstringIngestSpec extends SparkTestBase {
  import spark.implicits._

  private val k = 4

  test("persisted gram index: two ingest rounds equal full recomputes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gramidx").toString + "/idx"
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different content about catalyst rules")
    ).toDF("doc_id", "text")
    assert(graft.load.Load.replaceTable(
      spark, SubstringDedup.gramIndex(corpus, k), dir).isSuccess)

    // round 1: one whole-doc dup of doc 1, one novel doc
    val batch1 = Seq(
      (101L, "the quick brown fox jumps over the lazy dog"),
      (102L, "totally novel content nothing shared at all")
    ).toDF("doc_id", "text")
    val got1 = SubstringDedup.cleanKeepFirstIncremental(
      spark.read.parquet(dir), batch1, k)
    val exp1 = SubstringDedup.cleanKeepFirst(corpus.unionByName(batch1), k)
      .where($"doc_id" >= 100L)
    assertSameRows(got1, exp1)
    // doc 101 fully removed (dup of 1); doc 102 untouched
    val r1 = got1.select($"doc_id", $"removed_tokens", $"n_tokens")
      .as[(Long, Long, Long)].collect().map { case (a, b, c) => a -> (b, c) }.toMap
    assert(r1(101L)._1 == r1(101L)._2 && r1(102L)._1 == 0L)

    // fold round 1 into the index, persist
    assert(graft.load.Load.replaceTable(spark,
      SubstringDedup.updateGramIndex(spark.read.parquet(dir), batch1, k),
      dir).isSuccess)

    // round 2: a dup of the ROUND-1 batch doc must now be caught — the
    // corpus text was never touched again
    val batch2 = Seq((201L, "totally novel content nothing shared at all"))
      .toDF("doc_id", "text")
    val got2 = SubstringDedup.cleanKeepFirstIncremental(
      spark.read.parquet(dir), batch2, k)
    val exp2 = SubstringDedup.cleanKeepFirst(
      corpus.unionByName(batch1).unionByName(batch2), k)
      .where($"doc_id" >= 200L)
    assertSameRows(got2, exp2)
    assert(got2.select($"removed_tokens").as[Long].head() ==
      got2.select($"n_tokens").as[Long].head())
  }

  test("index-side gram bloom prefilter changes nothing but the shuffle") {
    val corpus = Seq(
      (1L, "shared run of tokens appears here today"),
      (2L, "other content nothing else shares it"),
      (3L, "third doc with its own private words")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "shared run of tokens appears here today again"),
      (11L, "fully fresh text no overlap anywhere now")
    ).toDF("doc_id", "text")
    val index = SubstringDedup.gramIndex(corpus, k)
    assertSameRows(
      SubstringDedup.cleanKeepFirstIncremental(index, batch, k),
      SubstringDedup.cleanKeepFirstIncremental(index, batch, k,
        indexGramPrefilter = false))
  }
}
