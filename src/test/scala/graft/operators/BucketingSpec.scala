package graft.operators

import graft.SparkTestBase
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Co-located join: both sides bucketed on their join keys with equal
  * bucket counts must sort-merge with ZERO exchanges, and produce the
  * same result as the plain shuffled join.
  */
class BucketingSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed-bucketed equi-join elides all shuffles") {
    val l = Bucketing.stageBucketed(spark,
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "b_lineitem", "l_orderkey", buckets = 8)
    val o = Bucketing.stageBucketed(spark,
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      "b_orders", "o_orderkey", buckets = 8)
    val joined = l.hint("merge")
      .join(o, col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n${plan.take(800)}")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"co-located join must not shuffle:\n${plan.take(1500)}")

    // and it computes the same thing as the ordinary join
    val plain = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .join(Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
    assertSameRows(joined, plain)
  }

  test("bucketed-unbucketed join shuffles only the unbucketed side") {
    val l = spark.table("b_lineitem")
    val raw = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val plan = l.hint("merge").join(raw, col("l_orderkey") === col("o_orderkey"))
      .queryExecution.executedPlan.toString
    // exactly one hash-partition exchange: the raw side aligning to buckets
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one exchange, got $exchanges:\n${plan.take(1500)}")
  }
}
