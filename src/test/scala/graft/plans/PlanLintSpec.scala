package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PlanLintSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")

  test("flags an unconditioned inner join") {
    val findings = PlanLint.lint(df.as("x").crossJoin(df.as("y")))
    assert(findings.exists(_.kind == "cartesian-join"), findings.toString)
  }

  test("flags an unpartitioned window") {
    val w = Window.orderBy($"id")
    val findings = PlanLint.lint(df.withColumn("rn", row_number().over(w)))
    assert(findings.exists(_.kind == "unpartitioned-window"), findings.toString)
  }

  test("clean plans produce no findings") {
    val w = Window.partitionBy($"s").orderBy($"id")
    val other = Seq((1L, 10.0)).toDF("id", "x")
    val joined = df.join(other, "id")
      .withColumn("rn", row_number().over(w))
    assert(PlanLint.lint(joined).isEmpty)
    assert(PlanLint.lint(df.withColumn("rn", row_number().over(w))).isEmpty)
  }

  test("the injected optimizer rule records hazards at execution time") {
    PlanLintRule.reset()
    df.as("x").crossJoin(df.as("y")).collect()
    assert(PlanLintRule.seenKinds.exists(_.contains("cartesian-join")),
      s"rule saw: ${PlanLintRule.seenKinds}")
  }
}
