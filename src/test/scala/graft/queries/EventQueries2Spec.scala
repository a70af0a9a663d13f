package graft.queries

import graft.{Registry, SparkTestBase}

/** q169 sketch set operations: estimate sanity against the exact
  * counts riding in the same row, and the single-scan plan shape.
  * Cross-engine value equality is the DuckDB oracle's job (Verify).
  */
class EventQueries2Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q169: inclusion-exclusion estimate lands within KMV error of the exact overlap") {
    val r = Registry.byName("q169_kmv_overlap").run(spark, sf).head
    val est = r.getDouble(r.fieldIndex("inter_est"))
    val exact = r.getLong(r.fieldIndex("exact_inter"))
    assert(exact > 0, "fixture behaviors must overlap on active user-days")
    // three k=256 sketches compose: allow a generous 3x the ~6% single-
    // sketch standard error before calling the estimator broken
    assert(math.abs(est - exact) <= math.max(20.0, 0.2 * exact),
      s"inter_est $est too far from exact $exact")
    // union can never exceed the sum of parts, nor undercut either side
    val (ea, eb) = (r.getLong(r.fieldIndex("exact_click")),
      r.getLong(r.fieldIndex("exact_purchase")))
    val eu = r.getLong(r.fieldIndex("exact_union"))
    assert(eu <= ea + eb && eu >= math.max(ea, eb))
  }

  test("q169: one scan of the event log feeds all three sketches") {
    val plan = Registry.byName("q169_kmv_overlap").run(spark, sf)
      .queryExecution.optimizedPlan.toString
    val scans = "Relation.*events".r.findAllIn(plan).size +
      "parquet.*events".r.findAllIn(plan).size
    assert(scans <= 2, s"events must not be scanned per sketch:\n$plan")
  }
}
