package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables

/** SemDeDup cell-bounded semantic dedup: planted duplicates must be
  * dropped, survivors must be the non-dominated set, and the Lloyd
  * quality path must only ever drop genuine near-duplicates (every
  * drop is backed by an exact-cosine pair — the cell bound can MISS
  * pairs, never invent them).
  */
class SemDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // A corpus with exact planted duplicates: three disjoint direction
  // clusters plus verbatim copies. Unit axes keep cosines exact (0/1).
  private def planted() = {
    val dims = 8
    def axis(i: Int, scale: Float) =
      Array.tabulate(dims)(j => if (j == i) scale else 0f)
    Seq(
      (1L, axis(0, 1f)), (2L, axis(1, 1f)), (3L, axis(2, 1f)),
      // copies of id 1 (scaled — cosine is scale-invariant)
      (10L, axis(0, 2f)), (11L, axis(0, 0.5f)),
      // copy of id 2
      (20L, axis(1, 3f))
    ).toDF("vec_id", "embedding")
  }

  test("planted duplicates drop; distinct directions survive") {
    val v = SemDedup.semanticDedup(planted(), "vec_id", "embedding",
        nCells = 3, tau = 0.9)
      .select($"vec_id", $"kept").as[(Long, Boolean)].collect().toMap
    // seeds are ids 1,2,3 — each copy lands in its seed's cell and is
    // dominated by the smaller id
    assert(v(1L) && v(2L) && v(3L), "originals must survive")
    assert(!v(10L) && !v(11L) && !v(20L), "verbatim copies must drop")
  }

  test("pairwise domination is by the SMALLEST same-cell neighbor, order-free") {
    // ids 1,10,11 are all mutually identical: 10 and 11 both dominated
    // by 1 (and by each other) — pairwise domination drops both, keeps
    // only the smallest id. Rerun must agree (determinism).
    val a = SemDedup.semanticDedup(planted(), "vec_id", "embedding", 3, 0.9)
      .orderBy("vec_id").collect().toSeq
    val b = SemDedup.semanticDedup(planted(), "vec_id", "embedding", 3, 0.9)
      .orderBy("vec_id").collect().toSeq
    assert(a == b, "verdicts must be deterministic")
    val kept = a.filter(_.getAs[Boolean]("kept")).map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L))
  }

  test("every cell is non-empty and every doc gets exactly one verdict") {
    val emb = Tables.embeddings(spark, sf)
    val v = SemDedup.semanticDedup(emb, "vec_id", "embedding", 16, 0.4)
    assert(v.count() == emb.count(), "one verdict per doc")
    assert(v.select("cell").distinct().count() == 16,
      "each seed assigns at least itself to its cell")
    assert(v.groupBy("vec_id").count().where($"count" > 1).isEmpty,
      "verdicts are unique per doc")
  }

  test("lloyd path drops only genuine near-duplicates (exact-pair backed)") {
    val emb = Tables.embeddings(spark, sf)
    val tau = 0.3 // permissive enough for the random fixture to have pairs
    val dropped = SemDedup.semanticDedupLloyd(emb, "vec_id", "embedding", 8, tau)
      .where(!$"kept").select($"vec_id").as[Long].collect().toSet
    val exactDupIds = Similarity.nearDupPairs(emb, "vec_id", "embedding", tau)
      .select($"id_b").as[Long].collect().toSet
    assert(dropped.nonEmpty, "fixture at tau=0.3 should produce drops")
    assert(dropped.subsetOf(exactDupIds),
      s"cell-bounded drops must be exact near-dups: ${dropped -- exactDupIds}")
  }

  test("seedCells: probe ranks are dense per doc and rank-1 matches semanticDedup") {
    val emb = Tables.embeddings(spark, sf)
    val cells = SemDedup.seedCells(emb, "vec_id", "embedding", nCells = 8, probes = 2)
    val n = emb.count()
    // exactly `probes` rows per doc, ranks {1, 2}, distinct probed cells
    assert(cells.count() == 2 * n)
    assert(cells.groupBy("vec_id")
      .agg(array_sort(collect_list($"prnk")).as("r"), countDistinct($"cell").as("c"))
      .where($"r" =!= array(lit(1), lit(2)) || $"c" =!= 2).isEmpty,
      "every doc probes exactly two distinct cells, ranks 1 and 2")
    // the primary (rank-1) assignment is the single-probe assignment
    val prim = cells.where($"prnk" === 1).select($"vec_id", $"cell")
      .as[(Long, Long)].collect().toMap
    val single = SemDedup.semanticDedup(emb, "vec_id", "embedding", 8, tau = 0.4)
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toMap
    assert(prim == single)
  }

  test("multi-probe recovers cross-cell pairs the primary partition splits") {
    val emb = Tables.embeddings(spark, sf)
    val cells = SemDedup.seedCells(emb, "vec_id", "embedding", nCells = 8, probes = 2)
    val exact = Similarity.nearDupPairs(emb, "vec_id", "embedding", tau = 0.3)
      .select($"id_a", $"id_b")
    val shared = exact
      .join(cells.select($"vec_id".as("id_a"), $"cell"), Seq("id_a"))
      .join(cells.select($"vec_id".as("id_b"), $"cell"), Seq("id_b", "cell"))
      .select($"id_a", $"id_b").distinct()
    val prim = cells.where($"prnk" === 1)
    val samePrimary = exact
      .join(prim.select($"vec_id".as("id_a"), $"cell"), Seq("id_a"))
      .join(prim.select($"vec_id".as("id_b"), $"cell"), Seq("id_b", "cell"))
      .select($"id_a", $"id_b").distinct()
    // captured-by-probe ⊇ captured-by-primary (rank 1 is among the
    // probes), and on this fixture the inclusion is STRICT — the
    // second probe recovers pairs the primary cells split
    assert(samePrimary.exceptAll(shared).isEmpty)
    assert(shared.count() > samePrimary.count(),
      "the second probe must recover at least one split pair")
  }
}
