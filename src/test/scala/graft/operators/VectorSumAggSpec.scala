package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.VectorFunctions.vecSum

/** VectorSumAgg ≡ the posexplode/groupBy formulation it replaced. */
class VectorSumAggSpec extends SparkTestBase {
  import spark.implicits._

  test("element-wise sums match the posexplode formulation") {
    val df = (1 to 200).map { i =>
      (s"g${i % 4}", Array.tabulate(8)(j => (i * (j + 1)).toDouble))
    }.toDF("g", "v").repartition(7)

    val viaAgg = df.groupBy($"g").agg(vecSum($"v").as("vs"))
      .select($"g", posexplode($"vs").as(Seq("pos", "x")))
    val viaExplode = df.select($"g", posexplode($"v").as(Seq("pos", "x0")))
      .groupBy($"g", $"pos").agg(sum($"x0").as("x"))
      .select($"g", $"pos", $"x")
    assertSameRows(viaAgg, viaExplode)
  }

  test("null vectors are skipped; all-null group yields null") {
    val df = Seq(
      ("a", Some(Array(1.0, 2.0))), ("a", None), ("b", None)
    ).toDF("g", "v")
    val got = df.groupBy($"g").agg(vecSum($"v").as("vs"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("a").isDefined && got("b").isEmpty)
  }

  test("mismatched dims fail loudly") {
    val df = Seq(("a", Array(1.0)), ("a", Array(1.0, 2.0))).toDF("g", "v")
    val e = intercept[Exception](df.groupBy($"g").agg(vecSum($"v")).collect())
    assert(e.getMessage != null)
  }
}
