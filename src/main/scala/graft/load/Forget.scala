package graft.load

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.util.Try

/** Right-to-be-forgotten propagation: drop every row carrying a listed
  * key from each target table, atomically per table, with an audit
  * report — the GDPR/CCPA deletion pass a production corpus must run
  * and prove.
  *
  * Scale shape: the key list is usually tiny next to the tables
  * (thousands of subjects vs billions of rows) — it rides a broadcast
  * LEFT ANTI join, so each table is rewritten in one pass with no
  * shuffle of the big side. Each rewrite goes through
  * [[Load.replaceTable]]'s staged swap: a mid-rewrite failure leaves
  * that table's previous contents intact. Tables process sequentially
  * and the pass stops at the first failure; deletion is idempotent, so
  * rerunning after a partial pass converges (already-clean tables
  * report dropped = 0).
  */
final case class ForgetReport(
    destination: String, keyColumn: String,
    rowsBefore: Long, rowsAfter: Long) {
  def dropped: Long = rowsBefore - rowsAfter
}

object Forget {

  /** @param keys     one-column frame of subject keys to erase
    * @param targets  (table directory, key column) pairs to purge
    * @param format   DataSource format of the targets
    * @return reports in target order; Failure at the first table whose
    *         rewrite fails (earlier tables are already purged — rerun
    *         to converge)
    */
  def forgetKeys(
      spark: SparkSession, keys: DataFrame,
      targets: Seq[(String, String)], format: String = "parquet"): Try[Seq[ForgetReport]] = Try {
    val keyList = keyBroadcast(keys)
    targets.map { case (dir, keyCol) =>
      val table = read(spark, dir, format)
      val before = table.count()
      val kept = table.join(keyList, table(keyCol) === col("__forget_key"), "left_anti")
      val report = Load.replaceTable(spark, kept, dir, format).get
      ForgetReport(dir, keyCol, before, report.rows)
    }
  }

  /** Partition-scoped deletion — the form that survives 100 TB: a
    * whole-table rewrite to erase a few thousand subjects is a
    * non-starter when the table is 3 000 date partitions. One scan
    * finds the partitions that actually CONTAIN a listed key (cheap:
    * the key join prunes map-side against the broadcast list and only
    * partition values come back); only those partitions are rewritten,
    * through [[Load.replacePartitions]]' per-partition backup/rollback.
    * Affected partitions whose rows are ALL forgotten produce no
    * staged output, so they are passed as explicit drops — without
    * that the old files would silently survive (the GDPR failure
    * mode). A null partition value is matched null-safely and maps to
    * Hive's default-partition directory. Untouched partitions are
    * never read again, let alone rewritten; the audit row count is
    * derived without a post-rewrite full-table scan.
    */
  def forgetKeysPartitioned(
      spark: SparkSession, keys: DataFrame,
      dir: String, keyCol: String, partitionCol: String,
      format: String = "parquet"): Try[ForgetReport] = Try {
    val keyList = keyBroadcast(keys)
    val table = read(spark, dir, format)
    val before = table.count()
    val affected = table
      .join(keyList, table(keyCol) === col("__forget_key"), "left_semi")
      .select(col(partitionCol)).distinct().collect().map(_.get(0))
    if (affected.isEmpty) ForgetReport(dir, keyCol, before, before)
    else {
      val inAffected = partitionPredicate(col(partitionCol), affected)
      val affectedBefore = table.where(inAffected).count()
      val kept = table
        .where(inAffected)
        .join(keyList, table(keyCol) === col("__forget_key"), "left_anti")
      // partitions the deletion EMPTIES leave nothing in staging — name
      // them explicitly so their old files are removed, not orphaned
      val keptParts = kept.select(col(partitionCol)).distinct().collect()
        .map(_.get(0)).map(partitionDirName(partitionCol, _)).toSet
      val drops = affected.map(partitionDirName(partitionCol, _))
        .filterNot(keptParts).toSeq
      val report = Load.replacePartitions(
        spark, kept, dir, partitionCol, format, dropPartitions = drops).get
      ForgetReport(dir, keyCol, before, before - affectedBefore + report.rows)
    }
  }

  /** Null-safe membership: `isin(null)` never matches, so a null
    * partition needs its own disjunct.
    */
  private def partitionPredicate(c: Column, values: Array[Any]): Column = {
    val (nulls, nonNull) = values.partition(_ == null)
    val base = if (nonNull.isEmpty) lit(false) else c.isin(nonNull: _*)
    if (nulls.isEmpty) base else base || c.isNull
  }

  /** Destination directory name for a partition value, as Spark's
    * writer lays it out (escaped; null → Hive's default partition).
    */
  private def partitionDirName(partitionCol: String, value: Any): String = {
    val v =
      if (value == null) "__HIVE_DEFAULT_PARTITION__"
      else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(value.toString)
    s"$partitionCol=$v"
  }

  /** Same read options as Load's own count-back readers — a csv target
    * written by [[Load.replaceTable]] has headers and quoted newlines.
    */
  private def read(spark: SparkSession, dir: String, format: String): DataFrame = {
    val r = spark.read.format(format)
    (if (format == "csv")
      r.option("header", "true").option("multiLine", "true")
        .option("escape", "\"").option("inferSchema", "true")
    else r).load(dir)
  }

  private def keyBroadcast(keys: DataFrame): DataFrame = {
    require(keys.columns.length == 1,
      s"keys frame must have exactly one column, got ${keys.columns.mkString(", ")}")
    broadcast(keys.select(col(keys.columns.head).as("__forget_key")).distinct())
  }
}
