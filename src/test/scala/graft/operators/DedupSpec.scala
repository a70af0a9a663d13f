package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Planted-duplicate recall tests for the approximate dedup operators
  * (the DuckDB oracle covers algorithm determinism; these cover "does
  * the algorithm actually find near-duplicates").
  */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm windowsill every afternoon"
  private val nearDup = base.replace("warm", "cold") // 1-word edit
  private val distinct1 =
    "completely different content about spark catalyst optimizer rules and physical execution planning strategies"
  private val distinct2 =
    "yet another unrelated document discussing parquet column pruning predicate pushdown and shuffle partitioning"

  private def docs = Seq(
    (1L, base), (2L, nearDup), (3L, distinct1), (4L, distinct2), (5L, base)
  ).toDF("doc_id", "text")

  test("exact dedup groups identical canonical forms") {
    val out = Dedup.exact(docs, "doc_id", "text")
    assert(out.count() == 4) // 5 docs, one exact dup (1 & 5)
    val dup = out.where($"n_copies" === 2).collect()
    assert(dup.length == 1 && dup.head.getAs[Long]("keep_id") == 1L)
  }

  test("minhash LSH finds planted near-dup and exact dup, not distinct docs") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", tau = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 5L)), "exact dup must be found")
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 5L)), "near-dup must be found")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 4L || p._2 == 4L),
      "distinct docs must not pair")
  }

  test("incremental LSH pairs a batch against the corpus, never corpus-internal") {
    // corpus contains its own internal dup pair (1, 5) — the incremental
    // path must NOT report it; only batch→corpus pairs come back
    val corpus = docs // ids 1-5 (1 & 5 exact dups, 2 near-dup of both)
    val batch = Seq((101L, base), (102L, distinct1), (103L, "nothing in common here"))
      .toDF("doc_id", "text")
    val got = Dedup.minhashLshIncremental(corpus, batch, "doc_id", "text", tau = 0.3)
      .select($"doc_new", $"doc_old").as[(Long, Long)].collect().toSet
    assert(got.contains((101L, 1L)) && got.contains((101L, 5L)) && got.contains((101L, 2L)),
      s"batch dup of the base doc must pair with all its corpus copies, got $got")
    assert(got.contains((102L, 3L)), "batch dup of distinct1 must pair with it")
    assert(!got.exists(_._1 == 103L), "novel batch doc must not pair")
    assert(got.forall { case (n, o) => n >= 101L && o <= 5L },
      "pairs must always be batch-to-corpus (no corpus-internal pairs)")
  }

  test("minhash LSH matches brute-force verified pairs on planted data") {
    // brute force: all pairs with exact 3-gram Jaccard >= tau
    import graft.functions.TextFunctions._
    val s = docs.select($"doc_id", shingles(tokens($"text"), 3).as("sh"))
    val brute = s.as("x").join(s.as("y"), $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("a"), $"y.doc_id".as("b"),
        (size(array_intersect($"x.sh", $"y.sh")).cast("double") /
          size(array_union($"x.sh", $"y.sh"))).as("j"))
      .where($"j" >= 0.3).select("a", "b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", tau = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh == brute, s"lsh=$lsh brute=$brute")
  }

  test("fast-path minhash LSH matches the md5 path on planted data") {
    val fast = Dedup.minhashLshFast(docs, "doc_id", "text", tau = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(fast.contains((1L, 5L)) && fast.contains((1L, 2L)) && fast.contains((2L, 5L)),
      s"planted dups missing from $fast")
    assert(!fast.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 4L || p._2 == 4L),
      "distinct docs must not pair")
    // reported jaccard values are EXACT regardless of the hash family:
    // both paths verify candidates against the true shingle sets
    val md5 = Dedup.minhashLsh(docs, "doc_id", "text", tau = 0.3)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val fastJ = Dedup.minhashLshFast(docs, "doc_id", "text", tau = 0.3)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(fastJ == md5, s"verified pair sets diverge: fast=$fastJ md5=$md5")
  }

  test("fast-path recall on the documents fixture vs the md5 path") {
    val fixture = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val md5 = Dedup.minhashLsh(fixture, "doc_id", "text", tau = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val fast = Dedup.minhashLshFast(fixture, "doc_id", "text", tau = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // different hash families → different candidate recall; require
    // substantial agreement (both are 16-permutation, 8×2-band LSH)
    val overlap = (md5 & fast).size.toDouble / math.max(md5.size, 1)
    info(f"fast-path recall vs md5 path: $overlap%.2f (md5=${md5.size}, fast=${fast.size})")
    assert(overlap >= 0.7, s"fast path recall collapsed: $overlap")
  }

  test("simhash pairs planted near-dups with small hamming distance") {
    val out = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 12)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 5L)), "identical docs have hamming 0")
    assert(out.contains((1L, 2L)), "near-dup within hamming budget")
    assert(!out.exists(p => Set(p._1, p._2).intersect(Set(3L, 4L)).size == 2),
      "the two distinct docs must not pair with each other")
  }

  test("simhash of identical text is identical; near-dup is close") {
    val sh = Dedup.simhash64(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(5L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(2L)) <= 12)
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(3L)) > 12)
  }

  test("levenshtein blocked finds prefix-sharing near-dups with exact distances") {
    val out = Dedup.levenshteinBlocked(docs, "doc_id", "text", prefixLen = 20, maxDist = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // 1-5 exact (dist 0), 1-2 and 2-5 one-word edit (warm→cold = 4)
    assert(out((1L, 5L)) == 0L)
    assert(out((1L, 2L)) == 4L && out((2L, 5L)) == 4L)
    assert(!out.keySet.exists { case (a, b) => a == 3L || b == 3L || a == 4L || b == 4L },
      "distinct docs must not pair")
  }

  test("portable simhash60: top 4 bits clear; identical text identical; near-dup close") {
    val sh = Dedup.simhash60(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sh.values.foreach(s => assert((s >>> 60) == 0L, "bits 60-63 must be clear"))
    assert(sh(1L) == sh(5L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(2L)) <= 12)
    val pairs = Dedup.simhash60Pairs(docs, "doc_id", "text", maxHamming = 5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 5L)))
  }

  test("blocked ngram jaccard only compares within the blocking key") {
    val blocked = Seq(
      (1L, base, "s1"), (2L, nearDup, "s2"), // near-dups in DIFFERENT blocks
      (3L, base, "s1")                        // exact dup in same block
    ).toDF("doc_id", "text", "source")
    val out = Dedup.ngramJaccardBlocked(blocked, "doc_id", "text", "source", n = 2, tau = 0.25)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 3L))) // cross-block pair (1,2) invisible by design
  }
}
