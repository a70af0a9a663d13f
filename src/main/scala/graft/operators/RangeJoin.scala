package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned point-in-interval range join.
  *
  * Spark has no native range-join strategy: a plain
  * `p JOIN iv ON p.x BETWEEN iv.lo AND iv.hi` plans as
  * BroadcastNestedLoopJoin (every point × every interval) — fine when
  * one side is tiny, quadratic death otherwise. This operator maps the
  * range predicate onto an EQUI-join Catalyst can shuffle-partition:
  * points land in bin `floor(x / w)`, each interval explodes to the
  * bins it overlaps, and the join key is the bin. The exact predicate
  * filters the candidates, and because a point has exactly ONE bin,
  * each qualifying (point, interval) pair is emitted exactly once — no
  * dedup pass.
  *
  * Cost model: shuffled interval rows multiply by
  * `(hi - lo) / binWidth + 1`, and candidate pairs per bin are
  * `points_in_bin × intervals_covering_bin` — pick `binWidth` near the
  * typical interval length. Works on any long-valued axis (days since
  * epoch, epoch seconds, integer keys). Values may be negative
  * (`floor`, not truncation, assigns bins).
  */
object RangeJoin {

  /** Data-driven bin width for callers that do not know one. The cost
    * model wants the width near the TYPICAL interval length, but a
    * plain median is unsafe under length skew: a corpus of mostly
    * 1-unit intervals with a few month-long ones would pick width 1
    * and explode each long interval into millions of bins — the
    * silent 100 TB failure mode this default exists to close. So the
    * pick is `max(median, p99 / 64)`: typical intervals land in a
    * handful of bins, and even the 99th-percentile interval explodes
    * into at most ~64 — bounded fan-out either way. Computed by a
    * single-pass approximate-quantile aggregate (no shuffle; only the
    * two bound columns are scanned, one extra job before the join).
    * The explicit-width overloads remain for callers that know their
    * axis.
    */
  private[operators] def autoBinWidth(
      lengths: DataFrame): Long = {
    val q = lengths
      .select(col(lengths.columns.head).cast("double").as("_len"))
      .where(col("_len").isNotNull)
      .stat.approxQuantile("_len", Array(0.5, 0.99), 0.01)
    if (q.isEmpty) 1L // no intervals: width is irrelevant, any value joins nothing
    else math.max(1L, math.max(q(0).toLong, (q(1) / 64.0).toLong))
  }

  // Double-cast BEFORE subtracting: on date/timestamp axes raw
  // `hi - lo` is an interval type approxQuantile can't aggregate, and
  // on double axes an integral "+1" would skew the sample — a
  // quantile-derived width doesn't need the closed-interval +1 at all
  // (it only shifts every length by a constant).
  private def intervalLengths(df: DataFrame, loCol: String, hiCol: String): DataFrame =
    df.select((col(hiCol).cast("double") - col(loCol).cast("double")).as("_len"))

  /** [[pointInInterval]] with the bin width sampled from the interval
    * lengths — safe by default; see [[autoBinWidth]]. */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String): DataFrame =
    pointInInterval(points, intervals, pointCol, loCol, hiCol,
      autoBinWidth(intervalLengths(intervals, loCol, hiCol)))

  /** [[intervalOverlap]] with the bin width sampled from BOTH sides'
    * interval lengths — safe by default; see [[autoBinWidth]]. */
  def intervalOverlap(
      left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String): DataFrame =
    intervalOverlap(left, right, lLo, lHi, rLo, rHi,
      autoBinWidth(intervalLengths(left, lLo, lHi)
        .unionAll(intervalLengths(right, rLo, rHi))))

  /** Inner-join `points` to `intervals` where
    * `points(pointCol) BETWEEN intervals(loCol) AND intervals(hiCol)`
    * (both ends inclusive). All columns of both inputs are carried;
    * names must not collide.
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(!points.columns.contains("_bin") && !intervals.columns.contains("_bin"),
      "inputs must not carry a '_bin' column (internal working name)")
    val p = points.withColumn("_bin", floor(col(pointCol) / binWidth))
    val iv = intervals.withColumn("_bin",
      explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    p.join(iv, Seq("_bin"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bin")
  }

  /** Interval-interval OVERLAP join: inner-join `left` to `right`
    * where `[left.lLo, left.lHi]` and `[right.rLo, right.rHi]`
    * intersect (closed ends — touching intervals match). Same binning
    * idea as [[pointInInterval]], with the exactly-once condition an
    * interval pair needs: both sides explode to the bins they cover,
    * candidates meet on the bin equi-key, and a qualifying pair is
    * emitted ONLY in the bin where the overlap STARTS
    * (`floor(max(lLo, rLo) / w)`) — every overlapping pair shares that
    * bin by construction, so no dedup pass and no duplicate output.
    *
    * Cost: each side's shuffled rows multiply by `span/binWidth + 1`;
    * candidates per bin are `left_in_bin × right_in_bin`. Pick
    * `binWidth` near the typical interval length — much smaller
    * explodes long intervals into many bins, much larger piles
    * unrelated intervals into the same candidate set. Intervals must
    * satisfy lo ≤ hi; both axes are long-valued (epoch seconds/micros,
    * days, keys).
    */
  def intervalOverlap(
      left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(!left.columns.contains("_bin") && !right.columns.contains("_bin"),
      "inputs must not carry a '_bin' column (internal working name)")
    val l = left.withColumn("_bin",
      explode(sequence(floor(col(lLo) / binWidth), floor(col(lHi) / binWidth))))
    val r = right.withColumn("_bin",
      explode(sequence(floor(col(rLo) / binWidth), floor(col(rHi) / binWidth))))
    l.join(r, Seq("_bin"))
      .where(col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
        col("_bin") === floor(greatest(col(lLo), col(rLo)) / binWidth))
      .drop("_bin")
  }
}
