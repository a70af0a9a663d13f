package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Dev probe: q144 cost breakdown — pair generation vs peel. */
object Q144Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def pairs = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2), size(col("ps"))),
          y => struct(x.as("u"), y.as("v"))))))
        .as("e"))
      .select(col("e.u"), col("e.v"))

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime; f
      println(f"[probe] $name: ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    t("warm pair-gen")(pairs.write.format("noop").mode("overwrite").save())
    t("pair-gen noop")(pairs.write.format("noop").mode("overwrite").save())
    t("full core()")(
      graft.operators.KCore.core(pairs, "u", "v", k = 80)
        .write.format("noop").mode("overwrite").save())
    t("full core() again")(
      graft.operators.KCore.core(pairs, "u", "v", k = 80)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
