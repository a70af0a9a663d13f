package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Dev probe: Spark exact-percentile conventions vs DuckDB's
  * quantile_cont on the q150 column. */
object PctProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val li = Tables.lineitem(spark, args(0))
      .where(col("l_returnflag") === "R")
      .select((col("l_extendedprice") * 100).cast("long").as("cents"))
    li.agg(
      count(lit(1)).as("n"),
      percentile(col("cents"), lit(0.75)).as("p75_scalar"),
      percentile(col("cents"), array(lit(0.25), lit(0.5), lit(0.75))).as("p_arr"),
      expr("percentile(cents, 0.75)").as("p75_sql")).show(false)

    Seq(0L, 1L, 2L, 3L).toDF("x")
      .agg(percentile(col("x"), lit(0.75)), expr("percentile(x, array(0.25,0.5,0.75))"))
      .show(false)
    spark.stop()
  }
}
