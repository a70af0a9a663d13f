package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL
  * over the same fixture tables. `headline` marks queries timed by Bench.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false,
    doc: String = "")
