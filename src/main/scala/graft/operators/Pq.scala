package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the high-compression ANN path: a 64-dim
  * float vector (256 B) becomes `m` small codes (8 B at m=8, k=16),
  * a 32× compression, scored against queries with asymmetric distance
  * (ADC): the query stays full-precision, each code looks up a
  * precomputed query-to-centroid dot product, so scoring is `m` array
  * lookups + adds per corpus row. This is the standard
  * billion-vector-on-one-cluster memory trick (FAISS's IndexPQ shape).
  *
  * Training follows the production pattern: codebooks fit on a
  * DETERMINISTIC driver-side sample (md5-hash-ordered ids — the same
  * sampling the IVF seeder uses), k-means per subspace with first-k
  * seeding and a fixed iteration count, then ship as literals — the
  * corpus never leaves the executors and every stage is reproducible.
  * Codebooks are data-dependent, so (like IVF's q48) the query entry is
  * rows-only; correctness is spec-gated: exact reconstruction when
  * vectors sit on centroids, recall floor vs the float brute force,
  * determinism across runs.
  *
  * Scale shape: encode is one narrow codegen-friendly projection per
  * row (no shuffle); ADC scoring is a broadcast of (query id, m×k
  * lookup table) against the coded corpus + the per-query rank window —
  * identical plan shape to Similarity.bruteForceTopK but on 32×-smaller
  * rows with multiply-free scoring.
  */
object Pq {

  /** Trained codebooks: `cents(j)(c)` is centroid c of subspace j. */
  final case class Codebooks(m: Int, k: Int, subDim: Int, cents: Array[Array[Array[Double]]])

  private def prepped(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("vid"),
      graft.functions.VectorFunctions.normalized(
        graft.functions.VectorFunctions.vecD(col(vecCol))).as("v"))

  /** Fit per-subspace codebooks on a deterministic hash-ordered sample. */
  def train(
      df: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 16, sampleSize: Int = 2048, iters: Int = 10): Codebooks =
    trainPrepped(prepped(df, idCol, vecCol), m, k, sampleSize, iters)

  /** [[train]] over an already-(vid, v)-shaped frame — the residual-PQ
    * entry point (operators.IvfPq), where v must NOT be re-normalized.
    */
  private[operators] def trainPrepped(
      pr: DataFrame, m: Int, k: Int, sampleSize: Int = 2048, iters: Int = 10): Codebooks = {
    val sample = pr
      .withColumn("h", graft.functions.TextFunctions.hash60(col("vid").cast("string")))
      .orderBy(col("h"), col("vid")).limit(sampleSize)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "cannot train PQ on an empty corpus")
    val dims = sample.head.length
    require(dims % m == 0, s"dims $dims not divisible by m=$m subspaces")
    val subDim = dims / m
    val cents = Array.tabulate(m) { j =>
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, j * subDim, (j + 1) * subDim))
      kmeans(subs, math.min(k, subs.length), iters)
    }
    Codebooks(m, k, subDim, cents)
  }

  /** Plain driver-side k-means, first-k seeding, fixed rounds — the
    * sample is ≤ a few thousand subvectors, so this is microseconds;
    * empty clusters keep their previous centroid (stable, no respawn
    * randomness).
    */
  private def kmeans(xs: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    var cents = xs.take(k).map(_.clone)
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Double](xs.head.length))
      val counts = new Array[Int](k)
      xs.foreach { x =>
        val c = nearestIdx(x, cents)
        var i = 0
        while (i < x.length) { sums(c)(i) += x(i); i += 1 }
        counts(c) += 1
      }
      cents = Array.tabulate(k)(c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c)))
    }
    cents
  }

  private def nearestIdx(x: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0; var i = 0
      while (i < x.length) { val t = x(i) - cents(c)(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** (vid, codes array<int>): per subspace, the index of the nearest
    * centroid by L2, ties to the LOWEST index (first strict minimum) so
    * encoding is deterministic. One codegen expression
    * (expressions.PqEncode) — the earlier m×k literal tree of
    * interpreted `aggregate(zip_with(…))` lambdas cost ~1 ms/row AND
    * handed Catalyst a thousand-node plan to analyze per query.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String, cb: Codebooks): DataFrame =
    encodePrepped(graft.core.Partitioning.fanOut(prepped(df, idCol, vecCol)), cb)

  /** [[encode]] over an already-(vid, v, …)-shaped frame; every column
    * except `v` rides through (the residual path keeps its cell id).
    */
  private[operators] def encodePrepped(p: DataFrame, cb: Codebooks): DataFrame =
    p.withColumn("codes",
        org.apache.spark.sql.graft.ColumnBridge.column(
          graft.expressions.PqEncode(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("v")), cb.cents)))
      .drop("v")

  /** The query batch is driver-built (one m×k-double lookup table per
    * query, then broadcast) — a serving-path shape, not a corpus-scale
    * one. The cap keeps the collect + broadcast bounded (~1 KB/query at
    * m=8, k=16); score a corpus-sized "query" set with a join-based
    * formulation instead. Query ids must be integral (cast to long).
    */
  val MaxAdcQueryBatch = 16384

  /** Top-k by ADC: per query, a flat m×k lookup table of
    * query-subvector · centroid dot products (driver-computed — m×k
    * doubles per query); corpus score = Σ_j table(j·k + code_j).
    */
  def adcTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      cb: Codebooks, topK: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val coded = encode(corpus, idCol, vecCol, cb)
    val qRows = prepped(queries, idCol, vecCol)
      .select(col("vid").cast("long").as("vid"), col("v")).collect()
    require(qRows.length <= MaxAdcQueryBatch,
      s"adcTopK query batch ${qRows.length} exceeds $MaxAdcQueryBatch — " +
        "the per-query lookup tables are driver-built and broadcast")
    val qs = qRows
      .map { r =>
        val q = r.getSeq[Double](1).toArray
        val table = Array.tabulate(cb.m * cb.k) { idx =>
          val j = idx / cb.k; val c = idx % cb.k
          val cent = cb.cents(j)(c)
          var s = 0.0; var i = 0
          while (i < cb.subDim) { s += q(j * cb.subDim + i) * cent(i); i += 1 }
          s
        }
        (r.getLong(0), table)
      }.toSeq.toDF("query_id", "tbl")
    val scored = coded.crossJoin(broadcast(qs))
      .where(col("vid") =!= col("query_id"))
      .select(col("query_id"), col("vid").as("neighbor_id"),
        org.apache.spark.sql.graft.ColumnBridge.column(
          graft.expressions.AdcScore(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("codes")),
            org.apache.spark.sql.graft.ColumnBridge.expression(col("tbl")),
            cb.k)).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
  }
}
