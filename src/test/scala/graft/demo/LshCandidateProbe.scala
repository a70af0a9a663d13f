package graft.demo

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev probe for the auto-bits scale claim: per SF dir, report the
  * corpus size, the derived signature width, and the DISTINCT LSH
  * candidate-pair count at auto width vs the old fixed bits = 4 —
  * candidates must grow ~linearly in N under auto sizing where the
  * fixed width grows ~N². Usage:
  *   Test/runMain graft.demo.LshCandidateProbe <sfDir> [--no-fixed]
  */
object LshCandidateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val skipFixed = args.contains("--no-fixed")
    val spark = graft.core.Sessions
      .configure(SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val bits = graft.operators.Similarity.autoBits(n)
    // tau = -2 keeps every scored bucket candidate (the q204 move):
    // the count IS the distinct candidate-pair volume
    def cands(b: Int): Long = {
      val t0 = System.nanoTime()
      val pairs = graft.operators.Similarity.nearDupPairsApprox(
        emb, "vec_id", "embedding", tau = -2.0, tables = 8, bits = b)
      val c = pairs.count()
      graft.operators.Lineage.release(pairs, blocking = true)
      println(f"[lshprobe] $sfDir n=$n bits=$b candidates=$c " +
        f"per_row=${c.toDouble / n}%.1f sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      c
    }
    cands(bits)
    if (!skipFixed) cands(4)
    spark.stop()
  }
}
