package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Benchmark decontamination — the training-data hygiene op: flag every
  * corpus document that shares at least one word n-gram with a
  * benchmark/eval set, so evaluation text can be dropped (or audited)
  * before training.
  *
  * Scale shape: the benchmark side is small by definition (eval sets
  * are thousands of docs, the corpus is billions), so its distinct
  * gram set is BROADCAST — the corpus is scanned once, never shuffled,
  * and only matching grams leave the map side. n=8 words is the usual
  * contamination window (long enough that shared grams mean copied
  * text, short enough to catch partial quotes).
  */
object Decontaminate {

  /** (doc_id, gram) pairs — distinct word n-grams per document. Widened
    * first: a small source file is one scan partition, which would run
    * the CPU-bound tokenize/shingle single-core (same rationale as
    * Dedup.fanOut).
    */
  private def gramsOf(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    graft.core.Partitioning.fanOut(df)
      .select(col(idCol).as("doc_id"),
        explode(textShingles(col(textCol), n)).as("gram"))

  /** Corpus docs sharing ≥1 n-gram with the benchmark: (doc_id,
    * n_shared_grams). Docs with zero overlap don't appear (the common
    * case — keep the output proportional to the contamination, not the
    * corpus).
    */
  def overlaps(
      corpus: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val bg = broadcast(
      gramsOf(bench, idCol, textCol, n).select(col("gram")).distinct())
    gramsOf(corpus, idCol, textCol, n)
      .join(bg, Seq("gram"), "left_semi")
      // grams are distinct per doc, so a plain count is the distinct
      // shared-gram count — no countDistinct shuffle needed
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** The decontaminated corpus: drop every flagged document.
    *
    * The flagged set is normally eval-set-sized (tiny), so it is
    * broadcast and the corpus never shuffles — but the broadcast is
    * GATED on a measured count: a pathologically contaminated corpus
    * could flag most of itself, and a mandatory broadcast of that
    * would blow the driver. The flagged frame is materialized ONCE via
    * eager localCheckpoint so the gram pipeline behind it runs once
    * (the count and the join both read the checkpoint blocks) — and,
    * unlike persist(), the blocks are released by the ContextCleaner
    * when the result is unreachable, so repeated clean() calls don't
    * accumulate session-lifetime cache entries.
    */
  def clean(
      corpus: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val flaggedDf = overlaps(corpus, bench, idCol, textCol, n)
      .select(col("doc_id"))
      .localCheckpoint()
    val maxRows = graft.core.Joins.maxBroadcastRows(corpus.sparkSession, bytesPerRow = 24)
    val flagged = if (flaggedDf.count() <= maxRows) broadcast(flaggedDf) else flaggedDf
    corpus.join(flagged, corpus(idCol) === flagged("doc_id"), "left_anti")
  }
}
