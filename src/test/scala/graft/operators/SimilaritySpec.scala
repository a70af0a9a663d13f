package graft.operators

import graft.SparkTestBase
import graft.core.Tables

/** LSH ANN quality against the exact baseline on the fixture embeddings.
  * These are RANDOM vectors (no cluster structure) — the honest recall
  * of hyperplane LSH is bounded here, so the floor is deliberately
  * modest; the spec's real job is catching broken signatures (recall ≈ 0)
  * and fake "ANN" that scans everything.
  */
class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("lshTopK reaches a recall floor vs brute force without scanning everything") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", k = 10,
        tables = 8, bits = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"recall@10 = $recall%.2f (random-vector corpus)")
    assert(recall >= 0.3, s"LSH recall collapsed: $recall")
    // and it must actually prune: candidate pairs well below N per query
    val candPerQuery = Similarity.lshBuckets(emb, "vec_id", "embedding", 8, 4)
      .groupBy("table", "bucket").count().agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("count") * org.apache.spark.sql.functions.col("count")))
      .first().getLong(0)
    val n = emb.count()
    assert(candPerQuery < 8 * n * n, "bucketing degenerated to a full scan")
  }

  test("approx near-dup pairs: verified subset of exact, decent recall") {
    // guarded, not absolute: other suites share this session and may
    // legitimately hold caches (e.g. a built IVF index)
    val cacheWasEmpty = spark.sharedState.cacheManager.isEmpty
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.nearDupPairs(emb, "vec_id", "embedding", tau = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val approx = Similarity.nearDupPairsApprox(emb, "vec_id", "embedding", tau = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(approx.subsetOf(exact), "every reported pair must be exactly verified")
    val recall = if (exact.isEmpty) 1.0 else (exact & approx).size.toDouble / exact.size
    info(f"near-dup recall = $recall%.2f (${approx.size}/${exact.size} pairs)")
    assert(recall >= 0.5, s"recall collapsed: $recall")
    // the bucket table is materialized via localCheckpoint, not persist:
    // repeated calls must not accumulate session-lifetime cache entries
    if (cacheWasEmpty) assert(spark.sharedState.cacheManager.isEmpty,
      "nearDupPairsApprox must not leave cached frames behind")
  }

  test("lshTopK on an empty query set returns empty, not a crash") {
    val emb = Tables.embeddings(spark, sf)
    val none = emb.where($"vec_id" < 0)
    assert(Similarity.lshTopK(emb, none, "vec_id", "embedding", k = 5).count() == 0)
    assert(Similarity.lshTopK(none, none, "vec_id", "embedding", k = 5).count() == 0)
  }

  test("same-vector query ranks itself out and its duplicate first") {
    val emb = Tables.embeddings(spark, sf).limit(50)
    // plant an exact duplicate of vec 0 with id 9999
    val dup = emb.where($"vec_id" === 0)
      .withColumn("vec_id", org.apache.spark.sql.functions.lit(9999L))
    val corpus = emb.unionByName(dup)
    val top = Similarity.bruteForceTopK(corpus, emb.where($"vec_id" === 0),
        "vec_id", "embedding", k = 1)
      .select("neighbor_id", "sim").as[(Long, Double)].collect()
    assert(top.head._1 == 9999L)
    assert(math.abs(top.head._2 - 1.0) < 1e-12)
  }

  test("knnGraph: exact sims, per-query bound, no self edges, symmetric candidates") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val g = Similarity.knnGraph(emb, "vec_id", "embedding", k = 5)
      .select($"query_id", $"neighbor_id", $"sim", $"rank")
      .as[(Long, Long, Double, Long)].collect()
    assert(g.nonEmpty)
    assert(g.forall { case (q, n, _, r) => q != n && r >= 1 && r <= 5 })
    val perQuery = g.groupBy(_._1).view.mapValues(_.length)
    assert(perQuery.values.forall(_ <= 5))
    // reported sims are EXACT cosines: recompute via brute force for a
    // few queries and compare bit-for-bit on the intersection
    val someQ = g.map(_._1).distinct.take(3)
    val brute = Similarity.bruteForceTopK(
        emb, emb.where($"vec_id".isin(someQ: _*)), "vec_id", "embedding", k = 1000)
      .select($"query_id", $"neighbor_id", $"sim").as[(Long, Long, Double)]
      .collect().map { case (q, n, s) => (q, n) -> s }.toMap
    g.filter(e => someQ.contains(e._1)).foreach { case (q, n, s, _) =>
      brute.get((q, n)).foreach(b => assert(b == s, s"sim mismatch at ($q,$n)")) }
  }

  test("graphSearch: exact sims, deterministic, finds planted duplicate, cleans storage") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val graph = Similarity.knnGraph(emb, "vec_id", "embedding", k = 4)
      .localCheckpoint(true)
    val queries = emb.where($"vec_id" < 3)
    def run() = {
      val res = Similarity
        .graphSearch(graph, emb, queries, "vec_id", "embedding", k = 5,
          beam = 8, rounds = 2, entryPoints = 2)
      val rows = res.select($"query_id", $"neighbor_id", $"sim", $"rank")
        .as[(Long, Long, Double, Long)].collect().toSet
      graft.operators.Lineage.release(res, blocking = true)
      rows
    }
    val a = run()
    val b = run()
    assert(a == b, "graphSearch must be deterministic (rank ties broken by id)")
    assert(a.nonEmpty && a.forall { case (q, n, _, _) => q != n })
    assert(a.groupBy(_._1).values.forall(_.size <= 5))
    // reported sims are EXACT cosines (bit-for-bit vs brute force)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 1000)
      .select($"query_id", $"neighbor_id", $"sim").as[(Long, Long, Double)]
      .collect().map { case (q, n, s) => (q, n) -> s }.toMap
    a.foreach { case (q, n, s, _) =>
      brute.get((q, n)).foreach(x => assert(x == s, s"sim mismatch at ($q,$n)")) }
    // every checkpoint staged by the two searches (beyond the input
    // graph, released here) must be gone: intermediate rounds release
    // in-operator, the final visited via Lineage.release(res). The
    // knnGraph build's internal bucket checkpoint was ORPHANED by the
    // graph's own localCheckpoint above (plan truncated), so its
    // release is the ContextCleaner's GC-driven contract — await it
    // rather than race it.
    graft.operators.Lineage.release(graph, blocking = true)
    assert(awaitStorageEmpty().isEmpty,
      "graphSearch must not strand block-manager storage")
  }

  test("knnGraph NN-descent refinement: per-node dominance, exact sims, degree bound, storage-clean") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    def edges(refine: Int) = {
      val g = Similarity.knnGraph(emb, "vec_id", "embedding", k = 4,
        refineRounds = refine)
      val rows = g.select($"query_id", $"neighbor_id", $"sim", $"rank")
        .as[(Long, Long, Double, Long)].collect()
      graft.operators.Lineage.release(g, blocking = true)
      rows
    }
    val seed = edges(0)
    val refined = edges(2)
    assert(refined.nonEmpty)
    assert(refined.forall { case (q, n, _, r) => q != n && r >= 1 && r <= 4 })
    assert(refined.groupBy(_._1).values.forall(_.size <= 4))
    // refinement only ever ADDS candidates before the same top-k, so
    // per node each rank position's sim must dominate the seed's
    val seedBy = seed.groupBy(_._1)
    refined.groupBy(_._1).foreach { case (q, rs) =>
      val s = seedBy.getOrElse(q, Array.empty).sortBy(_._4)
      rs.sortBy(_._4).zip(s).foreach { case (r, sd) =>
        assert(r._3 >= sd._3,
          s"refined rank ${r._4} of $q regressed: ${r._3} < ${sd._3}") }
    }
    // refined edge set reaches the exact graph at least as well as the seed
    val exact = Similarity.bruteForceTopK(
        emb, emb, "vec_id", "embedding", k = 4)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    def rec(g: Array[(Long, Long, Double, Long)]) =
      (g.map(e => (e._1, e._2)).toSet & exact).size.toDouble / exact.size
    val (rSeed, rRef) = (rec(seed), rec(refined))
    info(f"edge recall seed=$rSeed%.3f refined=$rRef%.3f")
    assert(rRef >= rSeed, "NN-descent must not lose exact edges")
    assert(rRef > rSeed, "on the LSH-seeded fixture graph refinement should recover edges")
    // reported sims are EXACT cosines (bit-for-bit vs brute force)
    val brute = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 1000)
      .select($"query_id", $"neighbor_id", $"sim").as[(Long, Long, Double)]
      .collect().map { case (q, n, s) => (q, n) -> s }.toMap
    refined.foreach { case (q, n, s, _) =>
      brute.get((q, n)).foreach(x => assert(x == s, s"sim mismatch at ($q,$n)")) }
    // in-operator staging discipline: rounds release their predecessors,
    // the seed's internal bucket checkpoint is rebased away, and the
    // final checkpoint went with Lineage.release above
    assert(awaitStorageEmpty().isEmpty,
      "knnGraph refinement must not strand block-manager storage")
  }

  test("autoDegree grows logarithmically with a floor of 8") {
    assert(Similarity.autoDegree(2) == 8)
    assert(Similarity.autoDegree(500) == 11)
    assert(Similarity.autoDegree(20000) == 18)
    assert(Similarity.autoDegree(1000000000L) == 36)
  }

  test("knnGraph fused top-k ≡ the distinct+window formulation, bit-for-bit") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val emb = graft.core.Tables.embeddings(spark, sf)
    val fused = Similarity.knnGraph(emb, "vec_id", "embedding", k = 5)
      .select($"query_id", $"neighbor_id", $"sim", $"rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    // the formulation the aggregate replaced: distinct pair set, both
    // directions, row_number window — must agree on every row including
    // ranks (same (sim desc, neighbor asc) total order)
    val pairs = Similarity
      .nearDupPairsApprox(emb, "vec_id", "embedding", tau = -2.0)
    val sym = pairs
      .select($"id_a".as("query_id"), $"id_b".as("neighbor_id"), $"sim")
      .unionAll(pairs.select($"id_b".as("query_id"), $"id_a".as("neighbor_id"), $"sim"))
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id")
    val windowed = sym.withColumn("rank", row_number().over(w).cast("long"))
      .where($"rank" <= 5)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(fused == windowed,
      s"fused top-k diverged from the window formulation " +
        s"(${(fused -- windowed).size} extra, ${(windowed -- fused).size} missing)")
  }

  test("bruteForceTopK heap rank ≡ the row_number window, bit-for-bit") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions.{dot, normalized, vecD}
    val emb = graft.core.Tables.embeddings(spark, sf)
    val queries = emb.where($"vec_id" < 7)
    val fused = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 9)
      .select($"query_id", $"neighbor_id", $"sim", $"rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    // the window formulation the aggregate replaced, same prep/dot path
    val c = emb.select($"vec_id".as("vid"), normalized(vecD($"embedding")).as("v"))
    val q = queries.select($"vec_id".as("query_id"),
      normalized(vecD($"embedding")).as("qv"))
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id")
    val windowed = c.crossJoin(broadcast(q)).where($"vid" =!= $"query_id")
      .select($"query_id", $"vid".as("neighbor_id"), dot($"qv", $"v").as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where($"rank" <= 9)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(fused == windowed)
  }

  test("topKDistinct: exact (score,id) repeats never occupy two rank slots") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.topKDistinct
    // 6 distinct neighbors for one query, each duplicated 3× (as if it
    // collided in 3 LSH tables); k = 4 must return the best 4 DISTINCT
    val rows = for (n <- 1 to 6; _ <- 1 to 3)
      yield (1L, n.toLong, n.toDouble / 10)
    // many partitions so duplicates split across partial buffers too
    val df = rows.toDF("query_id", "neighbor_id", "sim").repartition(7)
    val out = df.groupBy($"query_id")
      .agg(topKDistinct($"sim", $"neighbor_id", 4).as("t"))
      .select($"query_id", posexplode($"t").as(Seq("p", "e")))
      .select($"e.id".as[Long], $"e.score".as[Double]).collect().toSeq
    assert(out == Seq((6L, 0.6), (5L, 0.5), (4L, 0.4), (3L, 0.3)),
      s"got $out")
  }

  test("hardNegatives: every mined negative carries a different label") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val labels = emb.select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val neg = Similarity.hardNegatives(emb, "vec_id", "embedding", "label", k = 3)
      .select($"query_id", $"neighbor_id", $"neg_label", $"rank")
      .as[(Long, Long, Int, Long)].collect()
    assert(neg.nonEmpty)
    neg.foreach { case (q, n, nl, r) =>
      assert(labels(n) == nl, s"neg_label must be the neighbor's label ($q,$n)")
      assert(labels(q) != nl, s"a negative must be differently labeled ($q,$n)")
      assert(r >= 1 && r <= 3)
    }
    // negatives are ranked among NEGATIVES: an anchor's rank-1 negative
    // must dominate (or tie) every other reported negative of that anchor
    val sims = Similarity.hardNegatives(emb, "vec_id", "embedding", "label", k = 3)
      .select($"query_id", $"sim", $"rank").as[(Long, Double, Long)].collect()
    sims.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }
}
