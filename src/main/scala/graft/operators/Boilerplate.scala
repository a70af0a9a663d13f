package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate-LINE removal (the CCNet-family scrub):
  * after HTML extraction ([[Html.extractText]] emits one line per
  * block element), navigation/footer/cookie-banner blocks repeat
  * VERBATIM across a site's pages while main content is unique — so a
  * line's document frequency separates them. Complements the q101/q131
  * 5-gram flaggers: grams catch near-verbatim template PHRASES, the
  * line scrub removes exact repeated BLOCKS wholesale.
  *
  * Scale shape (100 TB): one full-line aggregate (map-side partial,
  * two-phase distinct on (line, doc)) computes document frequencies;
  * the BOILERPLATE set — lines with df >= minDf — is then tiny by
  * construction (boilerplate is few distinct lines repeated many
  * times; unique content never enters it), so the removal join is a
  * broadcast-able anti-join against that set, and the corpus line
  * table shuffles once more to reassemble documents. The skewed keys
  * (a footer line in half the corpus) live only on the STREAM side of
  * the anti-join — no hot-key build partition.
  */
object Boilerplate {

  /** Per-line document frequency over non-empty lines. */
  def lineDocFrequency(
      docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(split(coalesce(col(textCol), lit("")), "\n")).as("line"))
      .where(col("line") =!= "")
      .groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("df"))

  /** Remove lines whose document frequency reaches `minDf`, preserving
    * the survivors' order. Returns one row per input document:
    * (doc_id, n_lines, n_removed, cleaned) — `cleaned` is the kept
    * lines rejoined with '\n' ('' when everything was boilerplate, so
    * the row survives for loss accounting rather than vanishing).
    */
  def removeFrequentLines(
      docs: DataFrame, minDf: Long, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2 (1 would remove every line), got $minDf")
    // empty lines are KEPT in the exploded table (split always yields
    // >= 1 element, so every document reaches the groupBy — a doc with
    // no non-empty lines previously vanished, advice r13) and excluded
    // from the counts and the reassembly instead. They never match the
    // boilerplate side (lineDocFrequency filters them out).
    val lines = docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(coalesce(col(textCol), lit("")), "\n")).as(Seq("pos", "line")))
    val boiler = lineDocFrequency(docs, idCol, textCol)
      .where(col("df") >= minDf)
      .select(col("line"), lit(1L).as("_boiler"))
    // left join + flag (not anti-join): the removed COUNT per doc is
    // part of the report, so removed lines must stay countable
    lines.join(boiler, Seq("line"), "left")
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("line") =!= "", 1L).otherwise(0L)).as("n_lines"),
        sum(when(col("_boiler").isNotNull, 1L).otherwise(0L)).as("n_removed"),
        concat_ws("\n", transform(
          array_sort(collect_list(
            when(col("_boiler").isNull && col("line") =!= "",
              struct(col("pos"), col("line"))))),
          s => s.getField("line"))).as("cleaned"))
  }
}
