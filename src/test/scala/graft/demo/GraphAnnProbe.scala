package graft.demo

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev probe: graphSearch recall@10 vs brute force at a given SF, for
  * floor calibration. Usage: Test/runMain graft.demo.GraphAnnProbe <sfDir>
  */
object GraphAnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.Sessions
      .configure(SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val queries = emb.where(col("vec_id") < 5)
    val exact = graft.operators.Similarity
      .bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((deg, beam, rounds) <- Seq((8, 16, 3), (8, 32, 3), (8, 32, 4), (5, 32, 3))) {
      val t0 = System.nanoTime()
      val graph = graft.operators.Similarity
        .knnGraph(emb, "vec_id", "embedding", k = deg)
      val t1 = System.nanoTime()
      val ann = graft.operators.Similarity
        .graphSearch(graph, emb, queries, "vec_id", "embedding", k = 10,
          beam = beam, rounds = rounds)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = exact.count(ann.contains).toDouble / exact.size
      println(f"[probe] deg=$deg beam=$beam rounds=$rounds recall=$recall%.3f " +
        f"build=${(t1 - t0) / 1e9}%.2fs search=${(System.nanoTime() - t1) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
