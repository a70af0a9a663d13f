package graft.demo

import org.apache.spark.sql.functions._

/** Dev probe: IVF-PQ recall@10 with and without the exact refine stage
  * at a given SF. Usage: Test/runMain graft.demo.RefineProbe <sfDir>
  */
object RefineProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val queries = emb.where(col("vec_id") < 5)
    val exact = graft.operators.Similarity
      .bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
    def recall(ann: org.apache.spark.sql.DataFrame): Double =
      exact.join(ann.select(col("query_id"), col("neighbor_id")).distinct()
          .withColumn("_h", lit(1L)), Seq("query_id", "neighbor_id"), "left")
        .agg((sum(coalesce(col("_h"), lit(0L))) / count(lit(1))).as("r"))
        .head().getDouble(0)
    val ix = graft.operators.IvfPq.build(emb, "vec_id", "embedding", nCentroids = 16)
    for (depth <- Seq(10, 20, 40, 80)) {
      val ann = graft.operators.IvfPq
        .probe(ix, queries, "vec_id", "embedding", k = depth, nProbe = 4)
        .localCheckpoint(true)
      val plain = recall(ann.where(col("rank") <= 10))
      val refined = recall(graft.operators.Similarity.refineExact(
        ann, emb, queries, "vec_id", "embedding", k = 10, depth = depth))
      println(f"[refine] depth=$depth%-3d plain@10 $plain%.3f refined@10 $refined%.3f")
    }
    graft.operators.IvfPq.release(ix)
    spark.stop()
  }
}
