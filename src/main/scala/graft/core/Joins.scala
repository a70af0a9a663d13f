package graft.core

import org.apache.spark.sql.SparkSession

/** Join-shape helpers shared by the operator families. */
object Joins {

  /** Row budget for a GATED broadcast hint: the session's
    * autoBroadcastJoinThreshold divided by a caller-estimated row
    * width. Operators that force-broadcast a derived small side (loser
    * sets, flagged-id sets) check a measured count against this before
    * hinting, so a pathological input degrades to a shuffle join
    * instead of blowing the driver.
    */
  def maxBroadcastRows(spark: SparkSession, bytesPerRow: Int): Long = {
    val threshold =
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760"))
      catch { case _: Exception => 10485760L }
    if (threshold <= 0) 0L // broadcast disabled by config → never hint
    else math.max(1L, threshold / math.max(1, bytesPerRow))
  }
}
