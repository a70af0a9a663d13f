package graft.demo

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev probe: where does q155's time go? Times the scan+project
  * (date_format + decimal cents) separately from each percentile
  * formulation. Usage: Test/runMain graft.demo.QuantProfile <sfDir>
  */
object QuantProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions
      .configure(SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def li = graft.core.Tables.lineitem(spark, sfDir).select(
      col("l_returnflag"), col("l_linestatus"),
      date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"),
      (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long").as("cents"))
    def time(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[profile] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val raw = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_shipdate"), col("l_extendedprice"))
    time("scan only")(raw)
    time("scan+date_format")(raw.select(date_format(col("l_shipdate"), "yyyy-MM").as("m")))
    time("scan+substr-month")(raw.select(substring(col("l_shipdate").cast("string"), 1, 7).as("m")))
    time("scan+decimal-cents")(raw.select(
      (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long").as("cents")))
    time("scan+project")(li)
    time("scan+project+groupcount")(
      li.groupBy(col("l_returnflag"), col("l_linestatus"), col("ship_month")).count())
    time("agg path (ExactPercentiles)")(graft.operators.Quantiles.gridPercentilesAgg(
      li, Seq("l_returnflag", "l_linestatus", "ship_month"), "cents", Seq(0.25, 0.5, 0.75)))
    time("sort path")(graft.operators.Quantiles.gridPercentilesSorted(
      li, Seq("l_returnflag", "l_linestatus", "ship_month"), "cents", Seq(0.25, 0.5, 0.75)))
    spark.stop()
  }
}
