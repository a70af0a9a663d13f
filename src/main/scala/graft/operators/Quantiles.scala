package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles per group, sort-based.
  *
  * Spark's `percentile` aggregate buffers a per-group value→count map
  * (ObjectHashAggregate): every partial serializes its whole map, and
  * when values are near-distinct — prices, latencies, anything
  * continuous — the merge deserializes and unions maps the size of the
  * data itself. Measured on q150 (600k rows, 583k distinct values):
  * the map merge alone cost more than a full sort of the column.
  *
  * This formulation shuffles each row ONCE into its group's sort range
  * and reads the answer off ranks: rank each value in its group
  * (codegen sort + one window pass), keep only the rows sitting at a
  * requested interpolation position (≤ 2·|ps| rows per group), and
  * fold them into the interpolated values with a tiny aggregate.
  *
  * Pick by group count: a single group sorts in ONE task, so with
  * fewer groups than cores the sort path is skew-bound — q150's
  * 3-flag profile measured FASTER on the (combined-buffer) aggregate,
  * and keeps it. This operator is for the many-group regime (per-key
  * latency/price profiles, groups ≥ cores), where the aggregate ships
  * one value→count map per group per partial and this ships each row
  * once.
  *
  * Numeric contract: bit-identical to Spark's `percentile` — position
  * `(n−1)·p`, and `lo·(⌈pos⌉−pos) + hi·(pos−⌊pos⌋)` for fractional
  * positions, the same double operations in the same order — so
  * existing oracles (DuckDB `quantile_cont` hash-matches on
  * exactly-representable grids) transfer unchanged. QuantilesSpec pins
  * the equality on arbitrary (non-grid) percentages.
  *
  * Scale shape: one hash exchange on the group keys (the window's
  * partitionBy), sort within partitions, no per-value state. Skew
  * bound: a single group sorts in one task — for a near-keyless
  * profile at extreme scale, range-partition the value column and
  * compose counts instead (or accept `percentile_approx`, which is the
  * scale path q150 pairs with this exact anchor).
  *
  * Nulls in `valCol` are excluded, matching the aggregate's semantics.
  */
object Quantiles {

  /** @return one row per group: keyCols, `n` (non-null value count),
    *   and `pct` = array of interpolated percentiles aligned with `ps`
    *   (the `percentile(col, array(...))` output shape).
    */
  def gridPercentiles(
      df: DataFrame, keyCols: Seq[String], valCol: String,
      ps: Seq[Double]): DataFrame = {
    require(keyCols.nonEmpty, "gridPercentiles needs at least one group key")
    require(ps.nonEmpty, "gridPercentiles needs at least one percentage")
    require(ps.forall(p => p >= 0.0 && p <= 1.0), s"percentages outside [0,1]: $ps")
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col("_v"))
    val wc = Window.partitionBy(keys: _*)
    val rows = df.where(col(valCol).isNotNull)
      .select(keys :+ col(valCol).cast("double").as("_v"): _*)
      .withColumn("_idx", row_number().over(w).cast("long") - 1)
      .withColumn("_n", count(lit(1)).over(wc))
    // keep only rank positions some percentage interpolates from; the
    // filter runs inside the same window stage, so the wide sorted data
    // never leaves it
    def pos(p: Double): Column = (col("_n") - 1).cast("double") * lit(p)
    val needed = ps.map(p =>
      col("_idx") === floor(pos(p)) || col("_idx") === ceil(pos(p))).reduce(_ || _)
    val picked = rows.where(needed)
    // ≤ 2·|ps| rows per group survive; min(when(...)) collapses the
    // unique rank row (min of one value) into a column per bound
    val bounds = ps.zipWithIndex.flatMap { case (p, i) =>
      Seq(
        min(when(col("_idx") === floor(pos(p)), col("_v"))).as(s"_lo_$i"),
        min(when(col("_idx") === ceil(pos(p)), col("_v"))).as(s"_hi_$i"))
    }
    val agg = picked.groupBy(keys: _*)
      .agg(max(col("_n")).as("n"), bounds: _*)
      // a group whose values are ALL null has no surviving row, but the
      // percentile aggregate still emits it (null result, zero count) —
      // restore it from the key set so a caller switching from the
      // aggregate loses no groups
    val allGroups = df.select(keys: _*).distinct()
    // Spark Percentile.getPercentile's exact double expression:
    // lower==higher → the value; else lo·(⌈pos⌉−pos) + hi·(pos−⌊pos⌋)
    def interp(i: Int, p: Double): Column = {
      val position = (col("n") - 1).cast("double") * lit(p)
      when(floor(position) === ceil(position), col(s"_lo_$i"))
        .otherwise(
          col(s"_lo_$i") * (ceil(position) - position) +
            col(s"_hi_$i") * (position - floor(position)))
    }
    // null-safe key join (a NULL group key is still a group, exactly as
    // groupBy treats it); missing groups report n = 0 and a null pct —
    // the aggregate's output for an all-null group
    val joined = allGroups.join(agg,
      keyCols.map(c => allGroups(c) <=> agg(c)).reduce(_ && _), "left")
    joined.select(
      keyCols.map(allGroups(_)) ++ Seq(
        coalesce(col("n"), lit(0L)).as("n"),
        when(col("n").isNull, lit(null))
          .otherwise(array(ps.zipWithIndex.map { case (p, i) => interp(i, p) }: _*))
          .as("pct")): _*)
  }
}
