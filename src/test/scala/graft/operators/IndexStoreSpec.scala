package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables

/** Index persistence: a loaded index must probe BIT-IDENTICALLY to the
  * freshly built one (doubles round-trip parquet exactly), saves must
  * be atomic overwrites (second save replaces the first), and loads
  * must refuse directories that aren't saved indexes.
  */
class IndexStoreSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def probeRows(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long, Double, Long)].collect().toSet

  test("IVF round-trip: loaded index probes bit-identically") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/ix"
    val built = Ivf.build(emb, "vec_id", "embedding", nCentroids = 8)
    val want = probeRows(Ivf.probe(
      built._1, built._2, emb.where($"vec_id" < 5), "vec_id", "embedding", k = 10, nProbe = 3)
      .select($"query_id", $"neighbor_id", $"sim", $"rank"))
    IndexStore.saveIvf(spark, built, dir)
    Ivf.release(built)
    val loaded = IndexStore.loadIvf(spark, dir)
    val got = probeRows(Ivf.probe(
      loaded._1, loaded._2, emb.where($"vec_id" < 5), "vec_id", "embedding", k = 10, nProbe = 3)
      .select($"query_id", $"neighbor_id", $"sim", $"rank"))
    Ivf.release(loaded)
    assert(got == want)
  }

  test("IVF-PQ round-trip: codebooks and coded corpus survive exactly") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString + "/ix"
    val built = IvfPq.build(emb, "vec_id", "embedding", nCentroids = 8)
    val want = probeRows(IvfPq.probe(
      built, emb.where($"vec_id" < 5), "vec_id", "embedding", k = 10, nProbe = 3)
      .select($"query_id", $"neighbor_id", $"score", $"rank"))
    IndexStore.saveIvfPq(spark, built, dir)
    IvfPq.release(built)
    val loaded = IndexStore.loadIvfPq(spark, dir)
    assert(loaded.cb.m == built.cb.m && loaded.cb.k == built.cb.k)
    val got = probeRows(IvfPq.probe(
      loaded, emb.where($"vec_id" < 5), "vec_id", "embedding", k = 10, nProbe = 3)
      .select($"query_id", $"neighbor_id", $"score", $"rank"))
    IvfPq.release(loaded)
    assert(got == want)
  }

  test("kNN graph round-trip: persisted edges search bit-identically") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_knn").toString + "/ix"
    val built = Similarity.knnGraph(emb, "vec_id", "embedding", k = 4)
      .localCheckpoint(true)
    val queries = emb.where($"vec_id" < 3)
    def search(g: org.apache.spark.sql.DataFrame) = probeRows(
      Similarity.graphSearch(g, emb, queries, "vec_id", "embedding", k = 5,
          beam = 8, rounds = 2, entryPoints = 2)
        .select($"query_id", $"neighbor_id", $"sim", $"rank"))
    val want = search(built)
    IndexStore.saveKnnGraph(spark, built, dir)
    Lineage.release(built)
    val loaded = IndexStore.loadKnnGraph(spark, dir)
    val got = search(loaded)
    loaded.unpersist(blocking = true)
    assert(got == want)
    assert(want.nonEmpty && want.forall(_._4 <= 5))
  }

  test("a second save atomically replaces the first; foreign dirs refuse") {
    val emb = Tables.embeddings(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("graft_ixswap").toString
    val dir = base + "/ix"
    val ix8 = Ivf.build(emb, "vec_id", "embedding", nCentroids = 8)
    IndexStore.saveIvf(spark, ix8, dir)
    Ivf.release(ix8)
    val ix4 = Ivf.build(emb, "vec_id", "embedding", nCentroids = 4)
    IndexStore.saveIvf(spark, ix4, dir) // overwrite via staged swap
    Ivf.release(ix4)
    val loaded = IndexStore.loadIvf(spark, dir)
    assert(loaded._1.count() == 4, "second save must fully replace the first")
    Ivf.release(loaded)
    // no stray staging/backup debris after a clean swap
    assert(!new java.io.File(dir + "__staging").exists())
    assert(!new java.io.File(dir + "__old").exists())
    // a random parquet dir is not an index
    val foreign = base + "/foreign"
    Seq((1L, 2L)).toDF("a", "b").write.parquet(foreign)
    intercept[IllegalArgumentException] { IndexStore.loadIvf(spark, foreign) }
  }
}
