package graft.queries

import graft.{Registry, SparkTestBase}

/** Partition-layout independence: the engine's determinism contract
  * says every query's RESULT is identical under any shuffle
  * partitioning (the property that lets the DuckDB oracle hash-compare
  * at all, and the property a 1000-executor deployment silently relies
  * on). Run a representative slice of the newest families under three
  * different shuffle-partition settings and assert identical row
  * multisets. Floating aggregates are excluded by construction — the
  * slice is integer/decimal-exact queries, which is exactly the class
  * that must be bit-stable.
  */
class PartitionIndependenceSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  // heavy-shuffle integer-exact representatives across families:
  // graph iteration, basket lift, rational slopes, TWAP, Pareto,
  // autocorrelation, systematic sampling, HITS — plus the round-9
  // additions (approx dedup chain with closure + cluster-hash split,
  // banded dHash pairs, kNN graph, hard negatives: the kNN rows carry
  // exact sequential-fold cosines, deterministic by construction)
  private val slice = Seq(
    "q177_label_propagation", "q180_basket_lift", "q187_trend_slopes",
    "q191_twap_by_type", "q193_pareto_customers", "q201_autocorrelation",
    "q175_systematic_sample", "q178_hits_paths",
    "q203_leakage_split_approx", "q159_image_phash_dedup",
    "q204_knn_graph", "q205_hard_negatives",
    // round-10: graph-ANN beam search (deterministic entry seeds +
    // id-tie-broken ranks) and the re-dispatched quantile profiles
    "q206_graph_ann", "q155_grouped_quantiles")

  test("results are identical under shuffle.partitions = 2, 5, 13") {
    val conf = spark.conf
    val original = conf.get("spark.sql.shuffle.partitions")
    try {
      val runs = Seq("2", "5", "13").map { n =>
        conf.set("spark.sql.shuffle.partitions", n)
        n -> slice.map(q => q -> rowsOf(Registry.byName(q).run(spark, sf))).toMap
      }
      val (baseN, base) = runs.head
      runs.tail.foreach { case (n, got) =>
        slice.foreach { q =>
          assert(got(q) == base(q),
            s"$q differs between shuffle.partitions=$baseN and =$n")
        }
      }
    } finally conf.set("spark.sql.shuffle.partitions", original)
  }
}
