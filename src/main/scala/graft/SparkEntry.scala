package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` exposes one entry per implemented operator family from
  * SURVEY.md §2 plus the LLM-pipeline extensions; `oracleSql` carries the
  * DuckDB-equivalent SQL for every SQL-expressible entry (same column
  * names both sides — the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("q05_multi_join").run(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(Registry.all.map(q => q.name -> q.run): _*)

  def oracleSql: Map[String, String] =
    scala.collection.immutable.ListMap(
      Registry.all.flatMap(q => q.oracle.map(o => q.name -> o.trim)): _*)
}
