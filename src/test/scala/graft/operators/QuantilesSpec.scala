package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables

/** Both physical percentile paths — the combined-buffer `percentile`
  * AGGREGATE (few-group regime) and the rank-window SORT path
  * (many-group regime) — must be BIT-IDENTICAL to Spark's `percentile`
  * aggregate: same position arithmetic, same interpolation expression,
  * on arbitrary (non-grid) percentages, with nulls excluded the same
  * way. That equality is what lets the quantile_cont oracles
  * (q150/q155/q171/q190) transfer unchanged across the dispatch.
  */
class QuantilesSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long, Seq[Double])].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("sort path matches the percentile aggregate bit-for-bit on non-grid percentages") {
    val ps = Seq(0.0, 0.23, 0.25, 0.5, 0.617, 0.9991, 1.0)
    val li = Tables.lineitem(spark, sf).select(
      col("l_returnflag").as("k"),
      (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long").as("v"))
    val viaAgg = collect(li.groupBy($"k")
      .agg(count(lit(1)).as("n"), percentile($"v", array(ps.map(lit): _*)).as("pct")))
    val viaSort = collect(Quantiles.gridPercentilesSorted(li, Seq("k"), "v", ps))
    assert(viaSort.keySet == viaAgg.keySet)
    viaAgg.foreach { case (k, (n, pct)) =>
      assert(viaSort(k)._1 == n, s"count mismatch for $k")
      // exact double equality, element-wise — not a tolerance check
      assert(viaSort(k)._2 == pct, s"percentile mismatch for $k")
    }
  }

  test("dispatcher's two paths are bit-identical (and dispatch picks by group count)") {
    val ps = Seq(0.1, 0.5, 0.77)
    val li = Tables.lineitem(spark, sf).select(
      col("l_returnflag").as("k"),
      (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long").as("v"))
    val viaAggPath = collect(Quantiles.gridPercentilesAgg(li, Seq("k"), "v", ps))
    val viaSortPath = collect(Quantiles.gridPercentilesSorted(li, Seq("k"), "v", ps))
    assert(viaAggPath == viaSortPath)
    // pinned routes agree with the dispatcher's own output
    val auto = collect(Quantiles.gridPercentiles(li, Seq("k"), "v", ps))
    val forcedSort = collect(Quantiles.gridPercentiles(li, Seq("k"), "v", ps, aggGroupLimit = 0L))
    val forcedAgg = collect(Quantiles.gridPercentiles(li, Seq("k"), "v", ps, aggGroupLimit = Long.MaxValue))
    assert(auto == viaAggPath && forcedSort == viaAggPath && forcedAgg == viaAggPath)
  }

  test("both paths exclude nulls, keep all-null groups, handle single-row and tied groups") {
    val df = Seq(
      ("a", Some(10L)), ("a", None), ("a", Some(20L)),
      ("b", Some(7L)),
      ("c", Some(5L)), ("c", Some(5L)), ("c", Some(5L)),
      ("d", None), ("d", None) // all-null group: must still emit (n=0, null pct)
    ).toDF("k", "v")
    val ps = Seq(0.25, 0.5, 0.75)
    val want = collect(df.groupBy($"k")
      .agg(count($"v").as("n"), percentile($"v", array(ps.map(lit): _*)).as("pct")))
    assert(collect(Quantiles.gridPercentilesSorted(df, Seq("k"), "v", ps)) == want)
    assert(collect(Quantiles.gridPercentilesAgg(df, Seq("k"), "v", ps)) == want)
    assert(collect(Quantiles.gridPercentiles(df, Seq("k"), "v", ps)) == want)
  }
}
