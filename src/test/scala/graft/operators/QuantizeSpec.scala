package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Tables

/** Int8 quantization contract: codes bounded, max-magnitude component
  * saturates to ±127, all-zero vectors stay zero, and the quantized
  * top-k tracks the float brute-force baseline (high recall — int8
  * max-abs quantization of 64-dim vectors loses little ordering).
  */
class QuantizeSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("codes are in [-127, 127] and the max-|x| component hits ±127") {
    val q = Quantize.quantized(Tables.embeddings(spark, sf), "vec_id", "embedding")
      .select($"vid",
        array_max($"codes").as("hi"),
        array_min($"codes").as("lo"),
        array_max(transform($"codes", c => abs(c))).as("peak"))
    val rows = q.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("hi") <= 127 && r.getAs[Long]("lo") >= -127,
        s"codes out of int8 range for vid ${r.get(0)}")
      // the max-abs element maps to exactly |x|*127/|x| + 0.5 → 127
      assert(r.getAs[Long]("peak") == 127,
        s"max-magnitude component must saturate, got ${r.getAs[Long]("peak")}")
    }
  }

  test("all-zero vector quantizes to all-zero codes (no 0/0)") {
    val df = Seq((1L, Array(0f, 0f, 0f)), (2L, Array(1f, -2f, 0.5f)))
      .toDF("vec_id", "embedding")
    val codes = Quantize.quantized(df, "vec_id", "embedding")
      .orderBy($"vid").as[(Long, Seq[Long])].collect()
    assert(codes(0)._2 == Seq(0L, 0L, 0L))
    assert(codes(1)._2 == Seq(64L, -127L, 32L)) // 1/2*127=63.5→floor(+0.5)=64
  }

  test("int8 top-k tracks float brute-force top-k closely") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val quant = Quantize.int8TopK(emb, queries, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & quant).size.toDouble / exact.size
    info(f"int8 recall@10 = $recall%.2f")
    // random-vector fixture: neighbor cosines are near-ties, so int8
    // rounding legitimately flips tail ranks (measured 0.78); the floor
    // catches broken quantization (recall ≈ 1/N), not tie churn
    assert(recall >= 0.7, s"int8 quantization lost too much ordering: $recall")
  }

  test("int8 top-k score is NOT cosine — but rank 1..k per query, k rows") {
    val emb = Tables.embeddings(spark, sf)
    val out = Quantize.int8TopK(emb, emb.where($"vec_id" < 3), "vec_id", "embedding", k = 7)
    val perQuery = out.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(perQuery.values.forall(_ == 7L))
    val ranks = out.where($"query_id" === 0).orderBy($"rank")
      .select("rank").as[Long].collect().toSeq
    assert(ranks == (1L to 7L))
  }
}
