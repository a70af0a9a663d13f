package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BPE train/apply: hand-checkable merges on a tiny corpus, the
  * greedy-consistency property (each trained merge is reproducible as
  * the top pair of the corpus folded through the PREVIOUS merges via
  * the apply path — apply∘train coherence), exhaustion fail-loud, and
  * subwordReport invariants.
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("hand example: merges and subword report") {
    // freq: aa×2, ab×1 → pairs (a,a):2 (a,b):1 → merge1 (a,a);
    // then aa=[aa], ab=[a,b] → merge2 (a,b)
    val docs = Seq((1L, "aa ab"), (2L, "aa")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, 2)
    assert(merges == Seq(("a", "a"), ("a", "b")))
    val rep = Bpe.subwordReport(docs, merges)
      .select($"doc_id", $"n_bpe_tokens").as[(Long, Long)].collect().toMap
    assert(rep == Map(1L -> 2L, 2L -> 1L)) // [aa],[ab] and [aa]
  }

  test("repeated-run merge semantics: aaaa under (a,a) then (aa,aa)") {
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, 2)
    // pairs of a·a·a·a: (a,a)×3 → merge → [aa,aa] → merge (aa,aa)
    assert(merges == Seq(("a", "a"), ("aa", "aa")))
    val rep = Bpe.subwordReport(docs, merges)
      .select($"n_bpe_tokens").as[Long].head()
    assert(rep == 1L) // single symbol aaaa
  }

  test("greedy consistency: merge i+1 is the top pair after applying merges 0..i via the apply path") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val n = 6
    val merges = Bpe.trainMerges(docs, n)
    assert(merges.distinct.size == n, "merges must be distinct")
    val vocab = docs
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("freq"))
      .localCheckpoint(true)
    for (i <- 0 until n) {
      val folded = vocab.select($"freq",
        Bpe.applyMerges($"w", merges.take(i)).as("symstr"))
      val syms = Bpe.symsOf($"symstr")
      val top = folded
        .select($"freq", explode(when(size(syms) >= 2,
          transform(sequence(lit(1), size(syms) - 1),
            j => struct(element_at(syms, j).as("l"), element_at(syms, j + 1).as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>"))).as("pr"))
        .groupBy($"pr.l".as("l"), $"pr.r".as("r"))
        .agg(sum($"freq").as("cnt"))
        .orderBy($"cnt".desc, $"l", $"r")
        .limit(1).select($"l", $"r").as[(String, String)].head()
      assert(top == merges(i),
        s"round ${i + 1}: top pair $top != trained merge ${merges(i)}")
    }
  }

  test("driver-gated trainer ≡ distributed trainer (ties, multibyte, astral-plane symbols)") {
    // engineered: repeated count ties (zz/qq, aa/ba), supplementary-
    // plane 𝕏 (U+1D54F — where Java UTF-16 ordering disagrees with
    // UTF-8 byte order) and BMP multibyte é, so the in-memory pick
    // order and code-point splitting are both exercised
    val docs = Seq(
      (1L, "aa ab ba 𝕏a 𝕏a a𝕏b 𝕏𝕏 z"),
      (2L, "aa ba ba 𝕏a zz zz qq qq"),
      (3L, "aa ab 𝕏𝕏𝕏 eée eée")
    ).toDF("doc_id", "text")
    val n = 8
    val fast = Bpe.trainMerges(docs, n) // vocab << gate → driver path
    val slow = Bpe.trainMerges(docs, n, maxDriverVocab = 0L) // forced distributed
    assert(fast == slow, s"driver $fast != distributed $slow")
    assertSameRows(Bpe.subwordReport(docs, fast), Bpe.subwordReport(docs, slow))
  }

  test("exhaustion fails loudly") {
    val docs = Seq((1L, "aa ab")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] { Bpe.trainMerges(docs, 5) }
    assert(e.getMessage.contains("exhausted"), e.getMessage)
  }

  test("subwordReport: token counts shrink monotonically with more merges and never below 1 per word") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
      .localCheckpoint(true)
    val merges = Bpe.trainMerges(docs, 4)
    val chars = Bpe.subwordReport(docs, Nil)
      .select($"doc_id", $"n_bpe_tokens".as("n0"))
    val merged = Bpe.subwordReport(docs, merges)
      .select($"doc_id", $"n_bpe_tokens".as("n4"))
    val words = docs.select($"doc_id",
      graft.functions.TextFunctions.tokenCount($"text").as("nw"))
    val joined = chars.join(merged, "doc_id").join(words, "doc_id")
      .select($"n0", $"n4", $"nw").as[(Long, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (n0, n4, nw) =>
      assert(n4 <= n0, "merges can only shrink the symbol count")
      assert(n4 >= nw, "a word never drops below one symbol")
    }
  }
}
