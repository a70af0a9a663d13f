package graft.operators

import graft.SparkTestBase
import graft.core.Tables

/** IVF-PQ: recall vs float brute force, candidate pruning actually
  * prunes, and residual PQ beats raw PQ at the same code budget (the
  * reason the composition exists).
  */
class IvfPqSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("recall floor vs brute force, with real pruning") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ix = IvfPq.build(emb, "vec_id", "embedding", nCentroids = 16)
    try {
      val got = IvfPq.probe(ix, queries, "vec_id", "embedding", k = 10, nProbe = 8)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val recall = (exact & got).size.toDouble / exact.size
      info(f"IVF-PQ recall@10 = $recall%.2f (nProbe=8/16 cells, random corpus)")
      assert(recall >= 0.15, s"recall collapsed: $recall")
      // pruning: candidates scored <= corpus × nProbe/nCells (+ slack
      // for uneven cells on unclustered data)
      val n = emb.count()
      val candidates = ix.coded.join(
          Ivf.nearest(Similarity.prep(queries, "vec_id", "embedding"),
            ix.centroids, keep = 8).select($"cid").distinct(), "cid")
        .count()
      assert(candidates < n, s"probe must not scan every cell ($candidates of $n)")
    } finally IvfPq.release(ix)
  }

  test("residual PQ beats raw PQ at the same code budget") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(s: Set[(Long, Long)]) = (exact & s).size.toDouble / exact.size
    val raw = {
      val cb = Pq.train(emb, "vec_id", "embedding")
      recallOf(Pq.adcTopK(emb, queries, "vec_id", "embedding", cb, topK = 10)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet)
    }
    // nProbe = all cells: isolate the RESIDUAL-quantization effect from
    // the IVF pruning effect
    val resid = recallOf(IvfPq.topK(emb, queries, "vec_id", "embedding",
        k = 10, nCentroids = 16, nProbe = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet)
    info(f"raw-PQ recall = $raw%.2f, residual-IVF-PQ recall = $resid%.2f")
    assert(resid >= raw - 0.05,
      s"residual quantization should not lose to raw PQ: $resid vs $raw")
  }
}
