package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temperature-based corpus resampling — the multilingual/multi-source
  * balancing step of large-scale training pipelines (sampling
  * probability ∝ n_s^α, α < 1 upweights small sources; the exponent
  * family popularized by multilingual-BERT/XLM-style training): pick a
  * per-source document quota from tempered counts, then take that many
  * documents per source by deterministic hash order.
  *
  * Engine-portable by construction (the PageRank fixed-point trick):
  * the only floating-point step is one `sqrt` (α = 0.5), which IEEE
  * 754 requires correctly rounded — identical in every engine — and
  * it is immediately floored onto a 2^20 fixed-point grid; quota
  * arithmetic from there is integer (long sums, integer division), so
  * quotas and the hash-ranked selection replicate bit-for-bit in a SQL
  * oracle (q153). For other α, pass a precomputed weight column —
  * `pow` is NOT correctly rounded and may differ across libms, so a
  * general-α path must ship its weights, not recompute them.
  *
  * Scale shape: one count aggregation (tiny result — one row per
  * source), quotas broadcast back, selection via a per-source
  * rank-by-hash window. The window sorts each source's rows in its own
  * partitions — the corpus shuffles once on the source key. A single
  * gigantic source bounds a task; salt-bucket the hash range per
  * source if one source dominates executors at the design point.
  *
  * Overflow bound: quotas compute `budget * w` in long arithmetic with
  * w ≈ sqrt(n)·2^20 — safe while budget · sqrt(max n) < 2^43 (a
  * 10^6-document budget over a 10^12-row source still fits).
  */
object Resample {

  private val FixedPoint = 1L << 20

  /** Per-source quotas: (srcCol, n_total, n_target) with
    * n_target = budget · w_s div Σw, w_s = ⌊sqrt(n_s)·2^20⌋.
    *
    * Rows with a NULL source are EXCLUDED (here and in
    * [[temperatureSample]], consistently): groupBy would give null its
    * own quota but the sample's equi-join could never fill it — the
    * quota would silently starve every real source. A corpus with
    * meaningful unknown-source rows should bucket them explicitly
    * (`coalesce(src, 'unknown')`) before resampling.
    */
  def temperatureTargets(
      df: DataFrame, srcCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val w = df.where(col(srcCol).isNotNull)
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_total"))
      .withColumn("_w",
        floor(sqrt(col("n_total").cast("double")) * FixedPoint).cast("long"))
    val denom = w.agg(sum(col("_w")).as("_d"))
    w.crossJoin(broadcast(denom))
      .select(col(srcCol), col("n_total"),
        expr(s"($budget * _w) div _d").as("n_target"))
  }

  /** The resampled corpus: every input column, `n_target` rows per
    * source chosen by md5-derived hash rank (ties to the id) — a
    * reproducible sample independent of partitioning and engine.
    * NULL-source rows are excluded (see [[temperatureTargets]]).
    */
  def temperatureSample(
      df: DataFrame, srcCol: String, idCol: String, budget: Long): DataFrame = {
    val targets = temperatureTargets(df, srcCol, budget)
      .select(col(srcCol), col("n_target"))
    val h = graft.functions.TextFunctions.hash60(
      concat(col(idCol).cast("string"), lit(":tmix")))
    val wnd = Window.partitionBy(col(srcCol)).orderBy(col("_h"), col(idCol))
    df.where(col(srcCol).isNotNull)
      .withColumn("_h", h)
      .withColumn("_rk", row_number().over(wnd).cast("long"))
      .join(broadcast(targets), Seq(srcCol))
      .where(col("_rk") <= col("n_target"))
      .drop("_h", "_rk", "n_target")
  }
}
