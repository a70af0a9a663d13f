package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the most recent right row at
  * or before its time, per partition key. Spark has no built-in as-of
  * join; the idiomatic scalable formulation is union + window rather
  * than a range join: tag both sides, sort within the partition key by
  * (time, side, id), and carry the last non-null right payload forward
  * with `last(..., ignoreNulls)`.
  *
  * Cost: ONE shuffle on the partition key + a window sort — no
  * quadratic range probe, no broadcast requirement; AQE handles skewed
  * keys. Right rows sort BEFORE left rows at equal timestamps, giving
  * at-or-before semantics; ties among right rows resolve to the highest
  * id (deterministic).
  */
object AsOfJoin {

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
      leftCols: Seq[String]): DataFrame = {
    val l = left.select(
      (col(on).as("_key") +: col(leftTime).as("_t") +: lit(1).as("_side") +:
        lit(null).cast(right.schema(rightId).dataType).as("_payload") +:
        leftCols.map(c => col(c).as(c))): _*)
    val r = right.select(
      (col(on).as("_key") +: col(rightTime).as("_t") +: lit(0).as("_side") +:
        col(rightId).as("_payload") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val w = Window.partitionBy(col("_key"))
      .orderBy(col("_t"), col("_side"), col("_payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(s"asof_$rightId", last(col("_payload"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select((col("_key").as(on) +: col("_t").as(leftTime) +:
        leftCols.map(col) :+ col(s"asof_$rightId")): _*)
  }

  /** Forward as-of: for each left row, the EARLIEST right row with
    * rightTime >= leftTime on the same key (null when none follows).
    * Same union+single-window shape as [[backward]] — one shuffle on
    * the key, no range join — with the frame reversed: first non-null
    * payload over [current row, unbounded following], right rows
    * sorted AFTER left at equal timestamps (`_side` descending) so a
    * tie still matches, smallest payload winning ties for determinism.
    */
  def forward(
      left: DataFrame, right: DataFrame, on: String,
      leftTime: String, rightTime: String, rightId: String,
      leftCols: Seq[String]): DataFrame = {
    val l = left.select(
      (col(on).as("_key") +: col(leftTime).as("_t") +: lit(1).as("_side") +:
        lit(null).cast(right.schema(rightId).dataType).as("_payload") +:
        leftCols.map(c => col(c).as(c))): _*)
    val r = right.select(
      (col(on).as("_key") +: col(rightTime).as("_t") +: lit(0).as("_side") +:
        col(rightId).as("_payload") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val w = Window.partitionBy(col("_key"))
      .orderBy(col("_t"), col("_side").desc, col("_payload"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r)
      .withColumn(s"asof_$rightId", first(col("_payload"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select((col("_key").as(on) +: col("_t").as(leftTime) +:
        leftCols.map(col) :+ col(s"asof_$rightId")): _*)
  }
}
