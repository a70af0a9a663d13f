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

  /** Catalog-table variant of [[forgetKeys]] — the deletion pass
    * against warehouse tables (the reference's actual sink surface,
    * `database_util.py`), through [[Load.replaceCatalogTable]]'s
    * staged rename swap. Same contract: sequential, stop at first
    * failure, idempotent rerun.
    */
  def forgetKeysCatalog(
      spark: SparkSession, keys: DataFrame,
      targets: Seq[(String, String)]): Try[Seq[ForgetReport]] = Try {
    val keyList = keyBroadcast(keys)
    targets.map { case (table, keyCol) =>
      val t = spark.table(table)
      val before = t.count()
      val kept = t.join(keyList, t(keyCol) === col("__forget_key"), "left_anti")
      val report = Load.replaceCatalogTable(spark, kept, table).get
      ForgetReport(table, keyCol, before, report.rows)
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
    * staged output, so every affected partition is ALSO passed as an
    * explicit drop — staged content wins for the rewritten ones, and
    * the emptied ones have their old files removed instead of silently
    * surviving (the GDPR failure mode).
    *
    * The table is read with partition-type INFERENCE DISABLED: the
    * partition column comes back as the raw directory string, so the
    * membership filter, the staged rewrite, and the drop names all
    * live in one value domain. With inference on, a value like `01`
    * reads back as the int `1` and a timestamp re-renders with a
    * trailing `.0` — the derived drop name then matches no directory
    * on disk and the old files survive while the audit claims they
    * were deleted. (Names must use Spark's own path escaping — written
    * by Spark, they round-trip exactly.) A null partition value is
    * matched null-safely and maps to Hive's default-partition
    * directory. Untouched partitions are never read again, let alone
    * rewritten; the audit row count is derived without a post-rewrite
    * full-table scan.
    */
  def forgetKeysPartitioned(
      spark: SparkSession, keys: DataFrame,
      dir: String, keyCol: String, partitionCol: String,
      format: String = "parquet"): Try[ForgetReport] = Try {
    val keyList = keyBroadcast(keys)
    val table = readRawPartitions(spark, dir, format)
    val before = table.count()
    val affected = table
      .join(keyList, table(keyCol) === col("__forget_key"), "left_semi")
      .select(col(partitionCol)).distinct().collect()
      .map(r => Option(r.getString(0)))
    if (affected.isEmpty) ForgetReport(dir, keyCol, before, before)
    else {
      val inAffected = partitionPredicate(col(partitionCol), affected)
      val affectedBefore = table.where(inAffected).count()
      val kept = table
        .where(inAffected)
        .join(keyList, table(keyCol) === col("__forget_key"), "left_anti")
      val drops = affected.map(partitionDirName(partitionCol, _)).toSeq
      val report = Load.replacePartitions(
        spark, kept, dir, partitionCol, format, dropPartitions = drops).get
      ForgetReport(dir, keyCol, before, before - affectedBefore + report.rows)
    }
  }

  /** Erasure over a [[graft.streaming.EventStreams.keyedUpsertSink]] /
    * changeFeedSink table, safe to run against a LIVE stream: the
    * store is hash-bucketed on its key (`__kp` partitions), so this is
    * [[forgetKeysPartitioned]] pointed at the bucket column — only
    * buckets containing listed keys are rewritten, emptied buckets are
    * dropped — wrapped in the table's single-writer lock, the same
    * lock every micro-batch publish takes. The pass and the stream
    * therefore SERIALIZE: a batch that fires mid-pass WAITS on its
    * lock acquire (the sink retries the lock for up to ~2 min — an
    * exception in foreachBatch would terminate the StreamingQuery, so
    * waiting, not failing, is what keeps the stream alive), then
    * merges against the purged table. A pass longer than the sink's
    * retry window does stop the stream — run long passes in a
    * maintenance window. Erased subjects must also
    * feed [[graft.streaming.EventStreams.withoutBlocklisted]] upstream
    * or live events re-insert them (spec proves the pairing).
    *
    * Note: the change FEED is an immutable log and is not rewritten
    * here — erase feed history separately (per-batch dirs are plain
    * parquet under `changeDir/batch=N`) if the deployment's retention
    * rules require it.
    */
  def forgetKeysUpsert(
      spark: SparkSession, keys: DataFrame, tableDir: String,
      keyCol: String): Try[ForgetReport] =
    Load.withLock(spark, tableDir, "forget pass") {
      forgetKeysPartitioned(
        spark, keys, tableDir, keyCol,
        graft.streaming.EventStreams.BucketCol).get
    }

  /** Null-safe membership: `isin(null)` never matches, so a null
    * partition needs its own disjunct.
    */
  private def partitionPredicate(c: Column, values: Array[Option[String]]): Column = {
    val nonNull = values.flatten
    val base = if (nonNull.isEmpty) lit(false) else c.isin(nonNull: _*)
    if (values.contains(None)) base || c.isNull else base
  }

  /** Destination directory name for a RAW partition-value string, as
    * Spark's writer lays it out (escaped; null → Hive's default
    * partition). Only sound because [[readRawPartitions]] yields the
    * unescaped directory string itself — no type round-trip.
    */
  private def partitionDirName(partitionCol: String, value: Option[String]): String = {
    val v = value.fold("__HIVE_DEFAULT_PARTITION__")(
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName)
    s"$partitionCol=$v"
  }

  /** Read with partition values kept as raw directory strings. The
    * inference conf is read at DataFrame CREATION (load() resolves
    * partitions eagerly), so restoring it right after is safe.
    */
  private def readRawPartitions(spark: SparkSession, dir: String, format: String): DataFrame = {
    val conf = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val prev = spark.conf.get(conf)
    spark.conf.set(conf, "false")
    try read(spark, dir, format)
    finally spark.conf.set(conf, prev)
  }

  /** Same read options as Load's own count-back readers — a csv target
    * written by [[Load.replaceTable]] has headers and quoted newlines
    * (schema unknown here, so csv pays an inference pass).
    */
  private def read(spark: SparkSession, dir: String, format: String): DataFrame =
    Load.reader(spark, format, None).load(dir)

  private def keyBroadcast(keys: DataFrame): DataFrame = {
    require(keys.columns.length == 1,
      s"keys frame must have exactly one column, got ${keys.columns.mkString(", ")}")
    broadcast(keys.select(col(keys.columns.head).as("__forget_key")).distinct())
  }
}
