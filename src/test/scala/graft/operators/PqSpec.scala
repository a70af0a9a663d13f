package graft.operators

import graft.SparkTestBase
import graft.core.Tables

/** PQ contract: hand-built codebooks encode/score exactly on
  * centroid-aligned unit vectors; trained codebooks are deterministic;
  * ADC recall tracks the float brute force within the distortion a
  * random-vector corpus allows.
  */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("centroid-aligned vectors: encoding exact, ADC score = exact dot") {
    // 4 dims, 2 subspaces, 2 centroids each — one-hot, so vectors are
    // unit-norm and normalization is the identity
    val cb = Pq.Codebooks(m = 2, k = 2, subDim = 2, cents = Array(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)),
      Array(Array(1.0, 0.0), Array(0.0, 1.0))))
    val rows = Seq(
      (0L, Array(1f, 0f, 1f, 0f)), // codes (0, 0) — but NOT unit: norm sqrt(2)
      (1L, Array(0f, 1f, 0f, 1f)),
      (2L, Array(1f, 0f, 0f, 1f)))
    // normalize drops each to 1/sqrt(2) per hot dim; nearest centroid is
    // unchanged (scale-invariant argmin for these one-hots)
    val df = rows.toDF("vec_id", "embedding")
    val codes = Pq.encode(df, "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes(0L) == Seq(0, 0) && codes(1L) == Seq(1, 1) && codes(2L) == Seq(0, 1))
    // ADC vs exact cosine: reconstruction error is the distance from the
    // normalized vector to its quantized form; same one-hot family on
    // both sides keeps the ORDER of scores exact
    val out = Pq.adcTopK(df, df.where($"vec_id" === 0), "vec_id", "embedding", cb, topK = 2)
      .select($"neighbor_id", $"rank").as[(Long, Long)].collect().toMap
    // query 0 = (1,0,1,0)/√2: neighbor 2 shares one hot dim (cos .5),
    // neighbor 1 shares none (cos 0)
    assert(out(2L) == 1L && out(1L) == 2L)
  }

  test("training is deterministic and shapes are right") {
    val emb = Tables.embeddings(spark, sf)
    val a = Pq.train(emb, "vec_id", "embedding", m = 8, k = 16, sampleSize = 256, iters = 4)
    val b = Pq.train(emb, "vec_id", "embedding", m = 8, k = 16, sampleSize = 256, iters = 4)
    assert(a.m == 8 && a.k == 16 && a.subDim == 8)
    assert(a.cents.flatten.flatten.toSeq == b.cents.flatten.flatten.toSeq,
      "hash-ordered sample + fixed iterations must reproduce bit-identically")
  }

  test("ADC recall tracks float brute force on the fixture") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where($"vec_id" < 5)
    val cb = Pq.train(emb, "vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = Pq.adcTopK(emb, queries, "vec_id", "embedding", cb, topK = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & pq).size.toDouble / exact.size
    info(f"PQ recall@10 = $recall%.2f (random-vector corpus, 32x compression)")
    // random 64-dim vectors are the distortion worst case; the floor
    // catches broken encode/ADC (recall ~ k/N = 0.02), not quantization
    assert(recall >= 0.15, s"PQ recall collapsed: $recall")
  }
}
