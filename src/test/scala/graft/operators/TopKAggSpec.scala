package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.VectorFunctions.topK

/** TopKPairs TypedImperativeAggregate ≡ the window top-k formulation,
  * including ties, short groups, and null skipping — across enough
  * partitions that partial/merge paths actually run.
  */
class TopKAggSpec extends SparkTestBase {
  import spark.implicits._

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy($"g")
      .agg(topK($"score", $"id", k).as("tk"))
      .select($"g", posexplode($"tk").as(Seq("pos", "t")))
      .select($"g", ($"pos" + 1).cast("long").as("rn"), $"t.id".as("id"), $"t.score".as("score"))

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"score".desc, $"id")
    df.where($"score".isNotNull)
      .withColumn("rn", row_number().over(w).cast("long"))
      .where($"rn" <= k)
      .select($"g", $"rn", $"id", $"score")
  }

  test("agg top-k equals window top-k on skewed synthetic data") {
    val rows = (1L to 5000L).map { i =>
      (s"g${i % 7}", i, (i % 113).toDouble) // many score ties within groups
    }
    val df = rows.toDF("g", "id", "score").repartition(13)
    assertSameRows(viaAgg(df, 5), viaWindow(df, 5))
  }

  test("groups smaller than k return all their rows") {
    val df = Seq(("a", 1L, 9.0), ("a", 2L, 8.0), ("b", 3L, 1.0)).toDF("g", "id", "score")
    assertSameRows(viaAgg(df, 10), viaWindow(df, 10))
  }

  test("NaN and signed-zero scores rank exactly as the window's ORDER BY DESC") {
    val df = Seq(
      ("a", 1L, 2.0), ("a", 2L, Double.NaN), ("a", 3L, 1.0),
      ("b", 4L, 0.0), ("b", 5L, -0.0), ("b", 6L, -1.0)
    ).toDF("g", "id", "score").repartition(3)
    // NaN sorts LARGEST under SQL desc; -0.0 == 0.0 ties break on id.
    // (Scala's == on boxed doubles is primitive — NaN != NaN — so the
    // multiset compare needs NaN canonicalized to a sentinel first.)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.withColumn("score", when(isnan($"score"), lit(Double.MaxValue)).otherwise($"score"))
    assertSameRows(canon(viaAgg(df, 2)), canon(viaWindow(df, 2)))
  }

  test("multiple NaN scores in one group tiebreak on id like the window") {
    // two NaNs, k=1: the window (ORDER BY score DESC, id) keeps id=1;
    // the aggregate must agree regardless of arrival/partition order
    val df = Seq(("a", 2L, Double.NaN), ("a", 1L, Double.NaN), ("a", 3L, 99.0))
      .toDF("g", "id", "score").repartition(3)
    val got = viaAgg(df, 1).select($"id").as[Long].collect().toSet
    assert(got == Set(1L), s"expected the min-id NaN row, got $got")
  }

  test("null scores are skipped like SQL aggregates skip null input") {
    val df = Seq(("a", 1L, Some(5.0)), ("a", 2L, None), ("a", 3L, Some(7.0)))
      .toDF("g", "id", "score")
    val got = viaAgg(df, 2).select($"id").as[Long].collect().toSet
    assert(got == Set(3L, 1L))
  }

  test("plan aggregates partially before the shuffle (no window sort of all rows)") {
    val df = (1L to 100L).map(i => (s"g${i % 3}", i, i.toDouble)).toDF("g", "id", "score")
    val plan = viaAgg(df, 3).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected an aggregate-based plan, got:\n$plan")
    assert(!plan.contains("Window"), "top-k agg must not fall back to a window")
  }
}
