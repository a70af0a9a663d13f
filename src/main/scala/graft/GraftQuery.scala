package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL
  * over the same fixture tables. `headline` marks the representative
  * subset used for plan review (PlanDump's default set); Bench times
  * ALL registered queries.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false,
    doc: String = "")
