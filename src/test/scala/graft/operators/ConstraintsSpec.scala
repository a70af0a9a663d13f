package graft.operators

import graft.SparkTestBase
import graft.operators.Constraints._
import org.apache.spark.sql.functions._

/** Declarative constraint checking: exact violation counts on planted
  * defects, null semantics (null violates value rules), single-scan
  * fusion of row-local rules, and duplicate-name rejection.
  */
class ConstraintsSpec extends SparkTestBase {

  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame, rules: Seq[Rule]) =
    Constraints.check(df, rules).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("planted defects are counted exactly; clean rules report ok") {
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "A", 5.0), (2L, "B", 10.0), (2L, "A", -1.0), // dup id, range miss
      (null, "Z", 3.0), // null id, bad domain
      (4L, "A", null)   // null measure
    ).toDF("id", "cat", "v")
    val got = report(df, Seq(
      NotNull("id_nn", "id"),
      InRange("v_range", "v", 0, 9),
      Accepted("cat_dom", "cat", Seq("A", "B")),
      MatchesRegex("cat_re", "cat", "^[A-Y]$"),
      Unique("id_uniq", Seq("id"))))
    assert(got("id_nn") == ((1L, 5L, 0L)))
    // -1 below, 10 above, null violates → 3
    assert(got("v_range") == ((3L, 5L, 0L)))
    assert(got("cat_dom") == ((1L, 5L, 0L)))
    assert(got("cat_re") == ((1L, 5L, 0L)))
    // both id=2 rows participate in the duplicated key → 2
    assert(got("id_uniq") == ((2L, 5L, 0L)))
  }

  test("foreign key counts misses and null keys; distinct ref can't multiply") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 99L)).toDF("id", "fk")
      .unionByName(Seq((4L, Option.empty[Long])).toDF("id", "fk"))
    // ref has DUPLICATE key rows — the join must not inflate total
    val ref = Seq(10L, 10L, 20L, 30L).toDF("rk")
    val got = report(df, Seq(ForeignKey("fk_ok", Seq("fk"), ref, Seq("rk"))))
    assert(got("fk_ok") == ((2L, 4L, 0L))) // 99 missing + null fk
  }

  test("clean table: every rule ok=1; all row-local rules share one scan") {
    val df = Seq((1L, "A"), (2L, "B")).toDF("id", "cat")
    val rules = Seq(
      NotNull("nn", "id"), Accepted("dom", "cat", Seq("A", "B")),
      Unique("uq", Seq("id")))
    val rep = Constraints.check(df, rules)
    assert(rep.collect().forall(_.getLong(3) == 1L))
    // row-local fusion: the not-null + accepted legs appear as ONE
    // aggregate over the source (a single Aggregate above the scan in
    // the union's first leg)
    val plan = rep.queryExecution.optimizedPlan.toString
    assert(!plan.contains("stack"), "no string-built stack parsing")
  }

  test("empty table: zero totals, vacuous pass") {
    val df = spark.emptyDataset[(Long, String)].toDF("id", "cat")
    val got = report(df, Seq(
      NotNull("nn", "id"), Unique("uq", Seq("id")),
      ForeignKey("fk", Seq("id"), Seq(1L).toDF("rk"), Seq("rk"))))
    assert(got("nn") == ((0L, 0L, 1L)))
    assert(got("uq") == ((0L, 0L, 1L)))
    assert(got("fk") == ((0L, 0L, 1L)))
  }

  test("duplicate rule names are rejected before any job runs") {
    val df = Seq((1L, "A")).toDF("id", "cat")
    val e = intercept[IllegalArgumentException] {
      Constraints.check(df, Seq(NotNull("x", "id"), Unique("x", Seq("id"))))
    }
    assert(e.getMessage.contains("duplicate rule names"))
  }
}
