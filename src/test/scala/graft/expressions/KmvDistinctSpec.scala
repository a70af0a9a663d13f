package graft.expressions

import graft.SparkTestBase
import graft.functions.TextFunctions.hash60
import graft.functions.VectorFunctions.kmvDistinct
import org.apache.spark.sql.functions._

class KmvDistinctSpec extends SparkTestBase {
  import spark.implicits._

  test("below k the sketch is exact") {
    val df = (1 to 100).map(i => (i % 7, i)).toDF("g", "v")
      .select(col("g"), hash60(col("v").cast("string")).as("h"), col("v"))
      .groupBy(col("g"))
      .agg(kmvDistinct(col("h"), 256).as("approx"), countDistinct(col("v")).as("exact"))
    df.collect().foreach(r =>
      assert(r.getDouble(1) == r.getLong(2).toDouble, s"group ${r.get(0)} not exact"))
  }

  test("estimate is partitioning-invariant and within ~5 standard errors") {
    val n = 20000
    val base = (1 to n).map(i => i.toString).toDF("v")
      .select(hash60(col("v")).as("h"))
    val est1 = base.repartition(1).agg(kmvDistinct(col("h"), 256)).first().getDouble(0)
    val est32 = base.repartition(32).agg(kmvDistinct(col("h"), 256)).first().getDouble(0)
    assert(est1 == est32, "sketch must be merge-order independent")
    val se = n / math.sqrt(256 - 2)
    assert(math.abs(est1 - n) < 5 * se, s"estimate $est1 too far from $n")
  }

  test("sketch union == sketch of union (mergeability, the cross-day property)") {
    // estimate(A ∪ B) computed by merging partial sketches must equal
    // the single-pass estimate — this is what makes per-partition /
    // per-day sketches safely combinable without rescanning
    val a = (1 to 5000).map(_.toString).toDF("v").select(hash60(col("v")).as("h"))
    val b = (2500 to 9000).map(_.toString).toDF("v").select(hash60(col("v")).as("h"))
    val merged = a.union(b).repartition(7)
      .agg(kmvDistinct(col("h"), 128)).first().getDouble(0)
    val onePass = a.union(b).repartition(1)
      .agg(kmvDistinct(col("h"), 128)).first().getDouble(0)
    assert(merged == onePass)
  }

  test("null hashes are skipped; empty input estimates zero") {
    val df = Seq(Some("a"), None, Some("b"), None).toDF("v")
      .select(when(col("v").isNotNull, hash60(col("v"))).as("h"))
    assert(df.agg(kmvDistinct(col("h"), 16)).first().getDouble(0) == 2.0)
    val empty = spark.emptyDataFrame.select(lit(1L).as("h")).where(lit(false))
    assert(empty.agg(kmvDistinct(col("h"), 16)).first().getDouble(0) == 0.0)
  }
}
