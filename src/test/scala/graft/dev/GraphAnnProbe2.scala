package graft.dev

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

/** Diagnose the q206 recall ceiling at sf0.1: is it the SEARCH
  * (entries/beam/rounds) or the GRAPH (LSH-built kNN edges missing the
  * true-neighbor connectivity)?
  */
object GraphAnnProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    val emb = Tables.embeddings(spark, d).localCheckpoint(true)
    val qs = emb.where(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)

    def recall(ann: org.apache.spark.sql.DataFrame): Double =
      exact.join(ann.select(col("query_id"), col("neighbor_id"))
          .withColumn("_h", lit(1L)), Seq("query_id", "neighbor_id"), "left")
        .agg(avg(coalesce(col("_h"), lit(0L)).cast("double"))).head().getDouble(0)

    // approximate (LSH) kNN graph — the q206 build
    val lshGraph = Similarity.knnGraph(emb, "vec_id", "embedding", k = 8).localCheckpoint(true)
    // EXACT kNN graph: brute-force all-pairs top-8 per node (probe-only)
    val ids = emb.select(col("vec_id"))
    val exactGraph = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 8)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)

    for ((gTag, g) <- Seq("lsh" -> lshGraph, "exact" -> exactGraph);
         (sTag, beam, rounds) <- { val sq = math.ceil(math.sqrt(emb.count().toDouble)).toInt
             Seq(("2sq-r3", 2*sq, 3), ("2sq-r4", 2*sq, 4), ("3sq-r3", 3*sq, 3), ("4sq-r3", 4*sq, 3), ("auto", 0, 0)) }) {
      val t0 = System.nanoTime()
      val ann = Similarity.graphSearch(g, emb, qs, "vec_id", "embedding",
        k = 10, beam = beam, rounds = rounds)
      val r = recall(ann)
      println(f"[gann2] $d graph=$gTag%-5s $sTag recall=$r%.3f wall=${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    spark.stop()
  }
}
