package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — for each left row, the nearest right row at-or-before
  * ([[backward]]) or at-or-after ([[forward]]) its time, per partition
  * key. Spark has no built-in as-of join; the idiomatic scalable
  * formulation is union + window rather than a range join: tag both
  * sides, sort within the partition key by (time, side, id), and carry
  * the nearest non-null right payload across with
  * `last/first(..., ignoreNulls)` over a one-sided frame.
  *
  * Cost: ONE shuffle on the partition key + a window sort — no
  * quadratic range probe, no broadcast requirement; AQE handles skewed
  * keys. At equal timestamps the right row is eligible in BOTH
  * directions (at-or-before / at-or-after); ties among right rows
  * resolve deterministically (backward: highest id wins — the last one
  * the frame sees; forward: lowest id wins — the first).
  */
object AsOfJoin {

  /** Shared union/window scaffolding; direction picks the sort of the
    * side tag (right rows must sort toward the frame), the frame side,
    * and the picker function. With a `tolerance`, the matched right
    * row's TIME is picked through the same window/frame (both pickers
    * see the same last/first non-null row) and matches farther than
    * the tolerance null out — pandas `merge_asof(tolerance=...)`
    * semantics at the same one-shuffle cost.
    */
  private def asOf(
      left: DataFrame, right: DataFrame, on: String,
      leftTime: String, rightTime: String, rightId: String,
      leftCols: Seq[String], forwardDir: Boolean,
      tolerance: Option[Column] = None): DataFrame = {
    // the union/window scaffolding owns these names; a left column
    // with one of them would be silently clobbered by the picker
    // values (Sessionize.mark's reserved-name rule, applied here)
    val reserved = Set("_key", "_t", "_side", "_payload", "_mt", s"asof_$rightId")
    leftCols.filter(reserved).foreach(c => require(false,
      s"left column '$c' collides with an AsOfJoin working name " +
        s"(reserved: ${reserved.mkString(", ")}) — rename it before joining"))
    val l = left.select(
      (col(on).as("_key") +: col(leftTime).as("_t") +: lit(1).as("_side") +:
        lit(null).cast(right.schema(rightId).dataType).as("_payload") +:
        leftCols.map(c => col(c).as(c))): _*)
    val r = right.select(
      (col(on).as("_key") +: col(rightTime).as("_t") +: lit(0).as("_side") +:
        col(rightId).as("_payload") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val sideOrder: Column = if (forwardDir) col("_side").desc else col("_side")
    val base = Window.partitionBy(col("_key"))
      .orderBy(col("_t"), sideOrder, col("_payload"))
    // the payload picker skips null-payload right rows — the time
    // picker must skip the SAME rows, or a nearer null-id right row's
    // timestamp would validate a farther payload against the tolerance
    val rightT = when(col("_side") === 0 && col("_payload").isNotNull, col("_t"))
    val (w, pick, pickT) =
      if (forwardDir)
        (base.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("_payload"), ignoreNulls = true),
          first(rightT, ignoreNulls = true))
      else
        (base.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("_payload"), ignoreNulls = true),
          last(rightT, ignoreNulls = true))
    val raw = l.unionByName(r)
      .withColumn(s"asof_$rightId", pick.over(w))
    val bounded = tolerance.fold(raw) { tol =>
      val withinTol =
        if (forwardDir) col("_mt") <= col("_t") + tol
        else col("_mt") >= col("_t") - tol
      raw.withColumn("_mt", pickT.over(w))
        .withColumn(s"asof_$rightId",
          when(withinTol, col(s"asof_$rightId")))
    }
    bounded
      .where(col("_side") === 1)
      .select((col("_key").as(on) +: col("_t").as(leftTime) +:
        leftCols.map(col) :+ col(s"asof_$rightId")): _*)
  }

  /** @param left       rows to enrich
    * @param right      rows providing the as-of payload
    * @param on         partition key column (both sides)
    * @param leftTime   left timestamp column
    * @param rightTime  right timestamp column
    * @param rightId    right id/payload column carried to the result (as `asof_<rightId>`)
    * @param leftCols   left columns to keep
    */
  def backward(
      left: DataFrame, right: DataFrame, on: String,
      leftTime: String, rightTime: String, rightId: String,
      leftCols: Seq[String]): DataFrame =
    asOf(left, right, on, leftTime, rightTime, rightId, leftCols, forwardDir = false)

  /** [[backward]] with a match-distance bound: payloads farther back
    * than `tolerance` (e.g. `expr("INTERVAL 3 DAYS")` for timestamps,
    * a numeric literal for numeric times) come back null — pandas
    * `merge_asof(tolerance=...)`.
    */
  def backwardWithin(
      left: DataFrame, right: DataFrame, on: String,
      leftTime: String, rightTime: String, rightId: String,
      leftCols: Seq[String], tolerance: Column): DataFrame =
    asOf(left, right, on, leftTime, rightTime, rightId, leftCols,
      forwardDir = false, tolerance = Some(tolerance))

  /** Forward as-of: for each left row, the EARLIEST right row with
    * rightTime >= leftTime on the same key (null when none follows).
    */
  def forward(
      left: DataFrame, right: DataFrame, on: String,
      leftTime: String, rightTime: String, rightId: String,
      leftCols: Seq[String]): DataFrame =
    asOf(left, right, on, leftTime, rightTime, rightId, leftCols, forwardDir = true)

  /** [[forward]] with a match-distance bound (see [[backwardWithin]]). */
  def forwardWithin(
      left: DataFrame, right: DataFrame, on: String,
      leftTime: String, rightTime: String, rightId: String,
      leftCols: Seq[String], tolerance: Column): DataFrame =
    asOf(left, right, on, leftTime, rightTime, rightId, leftCols,
      forwardDir = true, tolerance = Some(tolerance))
}
