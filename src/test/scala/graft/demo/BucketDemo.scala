package graft.demo

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Bucketing

/** Drive: bucketed co-located join plan + result parity. */
object BucketDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(8)
    val sf = "/root/testdata/sf0.01"
    val l = Bucketing.stageBucketed(spark,
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "demo_b_lineitem", "l_orderkey", 16)
    val o = Bucketing.stageBucketed(spark,
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      "demo_b_orders", "o_orderkey", 16)
    val joined = l.hint("merge").join(o, col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    println("SortMergeJoin: " + plan.contains("SortMergeJoin") +
      " | exchanges: " + "Exchange hashpartitioning".r.findAllIn(plan).size)
    println("joined rows: " + joined.count())
    val plain = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .join(Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
    println("matches plain join: " + (joined.count() == plain.count()))
    spark.stop()
  }
}
