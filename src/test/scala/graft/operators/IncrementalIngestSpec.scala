package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The steady-state ingest loop end-to-end: signature index persisted
  * as a table (Load.replaceTable), daily batches probed against it
  * WITHOUT re-tokenizing the corpus, survivors' signatures appended for
  * the next round. Two rounds, with the second finding dups against
  * docs that arrived in the first.
  */
class IncrementalIngestSpec extends SparkTestBase {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm windowsill every afternoon"
  private val other =
    "completely different content about spark catalyst optimizer rules and physical execution planning strategies"

  test("persisted index round-trips; two ingest rounds; index grows with survivors") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sigidx").toString + "/idx"
    val corpus = Seq((1L, base), (2L, other)).toDF("doc_id", "text")

    // build + persist the index (the one-time backfill)
    val idx0 = Dedup.signatureIndex(corpus, "doc_id", "text")
    assert(graft.load.Load.replaceTable(spark, idx0, dir).isSuccess)

    // round 1: batch with one dup of doc 1 and one novel doc
    val batch1 = Seq((101L, base), (102L, "totally novel content nothing shared at all"))
      .toDF("doc_id", "text")
    val pairs1 = Dedup.minhashLshIncrementalIndexed(
        spark.read.parquet(dir), batch1, "doc_id", "text")
      .select($"doc_new", $"doc_old").as[(Long, Long)].collect().toSet
    assert(pairs1 == Set((101L, 1L)), s"round 1: $pairs1")

    // append the SURVIVORS' signatures (102 survives; 101 was a dup)
    val survivors1 = batch1.where($"doc_id" === 102L)
    val grown = spark.read.parquet(dir)
      .unionByName(Dedup.signatureIndex(survivors1, "doc_id", "text"))
    assert(graft.load.Load.replaceTable(spark, grown, dir).isSuccess)

    // round 2: a dup of the ROUND-1 survivor must now be caught — the
    // corpus text was never touched again
    val batch2 = Seq((201L, "totally novel content nothing shared at all"))
      .toDF("doc_id", "text")
    val pairs2 = Dedup.minhashLshIncrementalIndexed(
        spark.read.parquet(dir), batch2, "doc_id", "text")
      .select($"doc_new", $"doc_old").as[(Long, Long)].collect().toSet
    assert(pairs2 == Set((201L, 102L)), s"round 2: $pairs2")

    // the indexed path equals the from-text path on the same corpus
    val corpusNow = Seq((1L, base), (2L, other),
      (102L, "totally novel content nothing shared at all")).toDF("doc_id", "text")
    val fromText = Dedup.minhashLshIncremental(corpusNow, batch2, "doc_id", "text")
      .select($"doc_new", $"doc_old").as[(Long, Long)].collect().toSet
    assert(fromText == pairs2, "indexed and from-text probes must agree")
  }
}
