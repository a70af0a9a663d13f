package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Int8 scalar quantization for embedding columns — the memory-scale
  * path for 100 TB vector corpora: a 64-dim float32 vector (256 B)
  * compresses to 64 int8 codes, so 4× more vectors fit per executor /
  * per shuffle partition, and the scoring inner loop becomes integer
  * multiply-adds over exact BIGINTs instead of floating dot products.
  *
  * The quantizer is symmetric per-vector max-abs:
  * `code_i = floor(x_i * 127 / max_j|x_j| + 0.5)` ∈ [-127, 127] — a
  * fixed left-to-right chain of IEEE double ops with no accumulation
  * order, so the DuckDB oracle replicates it verbatim and the whole
  * approximate result (integer scores included) hash-matches
  * bit-for-bit (same technique as the q42 LSH oracle). All-zero
  * vectors quantize to all-zero codes (no 0/0).
  *
  * Reference behavior target: embedding near-dup / similarity over the
  * `embeddings` fixture, same surface as Similarity.bruteForceTopK
  * (queries broadcast; corpus side never shuffles before the per-query
  * rank).
  */
object Quantize {

  /** (vid, codes array<long>) with codes in [-127, 127]. `fan` widens a
    * narrow corpus scan; leave it off for the handful of broadcast-bound
    * query rows (repartitioning 5 rows just to collect them back to the
    * driver for the broadcast is a pure-overhead exchange).
    */
  def quantized(df: DataFrame, idCol: String, vecCol: String,
      fan: Boolean = true): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    // array_max is order-independent (exact) and abs/floor/* / are
    // single IEEE ops — every element's code depends only on (x_i, mx).
    val mx = array_max(transform(v, x => abs(x)))
    val codes = when(mx === lit(0d), transform(v, _ => lit(0L)))
      .otherwise(transform(v, x => floor(x * lit(127d) / mx + lit(0.5d)).cast("long")))
    (if (fan) graft.core.Partitioning.fanOut(df) else df)
      .select(col(idCol).as("vid"), codes.as("codes"))
  }

  /** Top-k neighbors per query by integer dot product over int8 codes.
    * Queries are broadcast (small side), the corpus scans once; the
    * only shuffle is the per-query rank window — identical plan shape
    * to the float brute-force baseline but on 4×-smaller rows.
    */
  def int8TopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val c = quantized(corpus, idCol, vecCol)
    val q = quantized(queries, idCol, vecCol, fan = false)
      .withColumnRenamed("vid", "query_id").withColumnRenamed("codes", "qcodes")
    val scored = c.crossJoin(broadcast(q))
      .where(col("vid") =!= col("query_id"))
      .select(col("query_id"), col("vid").as("neighbor_id"),
        aggregate(zip_with(col("qcodes"), col("codes"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }
}
