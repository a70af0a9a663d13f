package graft.dev

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

/** Graph-ANN recall/wall A/B (round-13 verdict #7): fixed-4 entry
  * points vs the auto ⌈√N⌉ hash-spread set, q206's config
  * (deg=8, beam=32, rounds=4, k=10, queries = vec_id < 5).
  * Usage: Test/runMain graft.dev.GraphAnnProbe <sfDir> [<sfDir>...]
  */
object GraphAnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    for (d <- args) {
      val emb = Tables.embeddings(spark, d).localCheckpoint(true)
      val n = emb.count()
      val qs = emb.where(col("vec_id") < 5)
      val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
      val graph = Similarity.knnGraph(emb, "vec_id", "embedding", k = 8)
        .localCheckpoint(true)
      for ((tag, b, r, ep) <- Seq(("fixed-b32r4e4", 32, 4, 4), ("auto", 0, 0, 0))) {
        val t0 = System.nanoTime()
        val ann = Similarity.graphSearch(graph, emb, qs, "vec_id", "embedding",
          k = 10, beam = b, rounds = r, entryPoints = ep)
          .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
        val wall = (System.nanoTime() - t0) / 1e9
        val rec = exact.join(ann.withColumn("_h", lit(1L)),
            Seq("query_id", "neighbor_id"), "left")
          .agg(avg(coalesce(col("_h"), lit(0L)).cast("double")))
          .head().getDouble(0)
        println(f"[gann] $d n=$n $tag%-10s recall=$rec%.3f wall=$wall%.1fs")
        graft.operators.Lineage.release(ann)
      }
      graft.operators.Lineage.release(graph)
      graft.operators.Lineage.release(exact)
    }
    spark.stop()
  }
}
