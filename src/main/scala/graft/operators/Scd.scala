package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD Type-2 merge — the warehouse dimension-history pattern: instead
  * of overwriting a changed attribute, the current row is CLOSED
  * (`valid_to` set to the change timestamp) and a new version OPENED
  * (`valid_from` = change ts, `valid_to` null). Joins against facts can
  * then ask "what was this customer's segment AT order time" — the
  * question an overwrite destroys the answer to.
  *
  * Merge semantics per update row (key, attrs, effective ts):
  *  - new key → one open row;
  *  - attrs equal to the key's current row (null-safe) → no-op;
  *  - attrs differ → current row closed at ts, new open row from ts.
  * History rows already closed ride through untouched. One update per
  * key per merge (enforced — multiple same-key updates in one batch
  * have no defined order; run batches in sequence instead).
  *
  * Scale shape: one equi-join of updates against the CURRENT slice on
  * the key (broadcast when the update batch is small — the nightly
  * case), plus unions; closed history never shuffles. Pairs with
  * `Load.replaceTable`/`replacePartitions` to publish the result.
  */
object Scd {

  /** @param history  existing dimension history (key, attrs…,
    *                 valid_from, valid_to — null valid_to = current)
    * @param updates  new snapshot rows: (key, attrs…, effective-ts
    *                 column `ts`)
    * @param key      business key column
    * @param attrs    tracked attribute columns (same names both sides)
    */
  def merge(
      history: DataFrame, updates: DataFrame, key: String, attrs: Seq[String],
      tsCol: String = "ts"): DataFrame = {
    val histCols = (Seq(key) ++ attrs ++ Seq("valid_from", "valid_to")).map(col)
    val current = history.where(col("valid_to").isNull)
    val closedHistory = history.where(col("valid_to").isNotNull)

    val u = updates.select((Seq(col(key)) ++ attrs.map(col) :+ col(tsCol).as("_ts")): _*)
    // fail loudly on multiple updates per key — silent last-wins would
    // pick an arbitrary version order
    val dupKeys = u.groupBy(col(key)).count().where(col("count") > 1)
    require(dupKeys.isEmpty, {
      val ks = dupKeys.select(col(key)).limit(5).collect().mkString(", ")
      s"multiple updates for key(s) $ks in one merge batch — apply batches sequentially"
    })

    val cur = current.select(
      (Seq(col(key)) ++ attrs.map(c => col(c).as(s"_cur_$c")) :+
        col("valid_from").as("_cur_from")): _*)
    val joined = u.join(cur, Seq(key), "left")
    val isNew = col("_cur_from").isNull
    val changed = attrs.map(c => !(col(c) <=> col(s"_cur_$c"))).reduce(_ || _)

    // rows to open: new keys + changed keys
    val opened = joined.where(isNew || changed)
      .select((Seq(col(key)) ++ attrs.map(col) :+ col("_ts").as("valid_from") :+
        lit(null).cast("timestamp").as("valid_to")): _*)
    // current rows to close: changed keys only (semi join on that set)
    val toClose = joined.where(!isNew && changed)
      .select(col(key).as("_k"), col("_ts").as("_close_ts"))
    val closedNow = current.join(toClose, col(key) === col("_k"), "inner")
      .select((Seq(col(key)) ++ attrs.map(col) :+ col("valid_from") :+
        col("_close_ts").as("valid_to")): _*)
    // current rows NOT closed (unchanged or untouched) ride through
    val stillCurrent = current.join(toClose, col(key) === col("_k"), "left_anti")

    closedHistory.select(histCols: _*)
      .unionByName(stillCurrent.select(histCols: _*))
      .unionByName(closedNow)
      .unionByName(opened)
  }

  /** Point-in-time lookup: the dimension row valid AT `at` per key —
    * valid_from <= at < valid_to (null valid_to = open).
    */
  def asOf(history: DataFrame, at: Column): DataFrame =
    history.where(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
