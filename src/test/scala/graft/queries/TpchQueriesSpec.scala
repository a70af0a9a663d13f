package graft.queries

import graft.{Registry, SparkTestBase}
import org.apache.spark.sql.functions._

/** TPC-H-adapted family (q60-q73): execution sanity at sf0.001, the
  * Q17 decorrelation equivalence, and the plan shapes that carry the
  * scale story (broadcast dims, no unpartitioned windows).
  * Cross-engine value correctness is the DuckDB oracle's job (Verify).
  */
class TpchQueriesSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private val names = Seq(
    "q60_tpch4_exists", "q61_tpch7_volume", "q62_tpch8_share",
    "q63_tpch9_profit", "q64_tpch10_returns", "q65_tpch13_distribution",
    "q66_tpch14_promo", "q67_tpch15_topsupp", "q68_tpch16_suppcnt",
    "q69_tpch17_smallqty", "q70_tpch18_bigorders", "q71_tpch19_ors",
    "q72_tpch20_nested", "q73_tpch22_antijoin")

  test("every TPC-H query executes; non-degenerate ones return rows at sf0.001") {
    // q61's nation-pair slice is legitimately empty at the smallest SF.
    val mayBeEmpty = Set("q61_tpch7_volume")
    names.foreach { n =>
      val rows = Registry.byName(n).run(spark, sf).count()
      if (!mayBeEmpty(n)) assert(rows > 0, s"$n returned no rows")
    }
  }

  test("q69: decorrelated avg-join equals the correlated window formulation") {
    val decorrelated = Registry.byName("q69_tpch17_smallqty").run(spark, sf)
    val l = graft.core.Tables.lineitem(spark, sf)
    val p = graft.core.Tables.part(spark, sf).where(col("p_brand") === "Brand#3")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    val windowed = l.join(p, col("l_partkey") === col("p_partkey"))
      .withColumn("avg_qty", avg(col("l_quantity")).over(w))
      .where(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((graft.functions.Exact.sumExact2(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
    assertSameRows(decorrelated, windowed)
  }

  test("q64: dimension join broadcasts; q67: no window in the max-revenue plan") {
    val p64 = Registry.byName("q64_tpch10_returns").run(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p64.contains("BroadcastHashJoin"), "nation dim should broadcast in q64")
    val p67 = Registry.byName("q67_tpch15_topsupp").run(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p67.contains("Window"), "q67 must use broadcast max, not a global window sort")
  }

  test("q73: anti-join keeps only customers without urgent orders") {
    val c = graft.core.Tables.customer(spark, sf)
    val o = graft.core.Tables.orders(spark, sf)
    val urgentCust = o.where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0)).toSet
    val got = Registry.byName("q73_tpch22_antijoin").run(spark, sf)
    // every contributing customer is wealthy and urgent-order-free:
    // group counts must sum to the direct computation
    val avgBal = c.where(col("c_acctbal") > 0)
      .agg((sum(col("c_acctbal").cast("decimal(12,2)")).cast("double") / count(lit(1))))
      .first().getDouble(0)
    val expected = c.collect().count { r =>
      r.getDouble(r.fieldIndex("c_acctbal")) > avgBal &&
        !urgentCust(r.getLong(r.fieldIndex("c_custkey")))
    }
    val gotTotal = got.agg(sum(col("numcust"))).first().getLong(0)
    assert(gotTotal == expected)
  }
}
