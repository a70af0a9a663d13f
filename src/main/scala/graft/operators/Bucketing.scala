package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed staging for co-located joins (SURVEY §4 / the 100-TB shuffle
  * checklist): a table written with `bucketBy(n, key).sortBy(key)` is
  * physically hash-partitioned AND sorted on disk, so an equi-join
  * between two tables bucketed on their join keys with matching bucket
  * counts runs with ZERO exchanges — the sort-merge join reads
  * co-located buckets directly. This is the "pay the shuffle once at
  * write time, never again" pattern for fact tables joined repeatedly
  * on the same key.
  */
object Bucketing {

  /** Stage `df` as a bucketed+sorted managed table and return it (reads
    * of the returned frame carry the bucketing metadata Catalyst needs
    * to elide exchanges).
    */
  def stageBucketed(
      spark: SparkSession, df: DataFrame, table: String,
      key: String, buckets: Int): DataFrame = {
    // Unqualified names only: the orphaned-location cleanup below assumes
    // the default-database layout `<warehouse>/<table>`; a qualified
    // `db.tbl` lives at `<warehouse>/db.db/tbl` and would be missed (or
    // worse, a wrong path deleted).
    require(!table.contains("."),
      s"stageBucketed takes an unqualified table name, got '$table'")
    // Resolve the real location from the catalog when the table is known;
    // guessing would delete a path the catalog may still reference. Keep
    // the FULL URI (scheme + authority) — stripping to the path would
    // resolve against the default filesystem, not the table's.
    val catalogLoc = scala.util.Try(
      new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(table)).location)).toOption
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // An in-memory catalog forgets tables between JVMs while the
    // warehouse directory persists; clear any orphaned location or the
    // create fails with LOCATION_ALREADY_EXISTS.
    val loc = catalogLoc.getOrElse(new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/" + table.toLowerCase))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
    spark.table(table)
  }
}
