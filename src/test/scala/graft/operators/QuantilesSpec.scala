package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables

/** The sort-based exact percentile must be BIT-IDENTICAL to Spark's
  * `percentile` aggregate — same position arithmetic, same
  * interpolation expression — on arbitrary (non-grid) percentages,
  * with nulls excluded the same way. That equality is what lets q150's
  * quantile_cont oracle transfer unchanged.
  */
class QuantilesSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("matches the percentile aggregate bit-for-bit on non-grid percentages") {
    val ps = Seq(0.0, 0.23, 0.25, 0.5, 0.617, 0.9991, 1.0)
    val li = Tables.lineitem(spark, sf).select(
      col("l_returnflag").as("k"),
      (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long").as("v"))
    val viaAgg = li.groupBy($"k")
      .agg(count(lit(1)).as("n"), percentile($"v", array(ps.map(lit): _*)).as("pct"))
      .as[(String, Long, Seq[Double])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val viaSort = Quantiles.gridPercentiles(li, Seq("k"), "v", ps)
      .as[(String, Long, Seq[Double])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(viaSort.keySet == viaAgg.keySet)
    viaAgg.foreach { case (k, (n, pct)) =>
      assert(viaSort(k)._1 == n, s"count mismatch for $k")
      // exact double equality, element-wise — not a tolerance check
      assert(viaSort(k)._2 == pct, s"percentile mismatch for $k")
    }
  }

  test("excludes nulls, keeps all-null groups, handles single-row and tied groups") {
    val df = Seq(
      ("a", Some(10L)), ("a", None), ("a", Some(20L)),
      ("b", Some(7L)),
      ("c", Some(5L)), ("c", Some(5L)), ("c", Some(5L)),
      ("d", None), ("d", None) // all-null group: must still emit (n=0, null pct)
    ).toDF("k", "v")
    val ps = Seq(0.25, 0.5, 0.75)
    val got = Quantiles.gridPercentiles(df, Seq("k"), "v", ps)
      .as[(String, Long, Seq[Double])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val want = df.groupBy($"k")
      .agg(count($"v").as("n"), percentile($"v", array(ps.map(lit): _*)).as("pct"))
      .as[(String, Long, Seq[Double])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == want)
  }
}
