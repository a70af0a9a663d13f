package graft.dev
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/tmp/graft_sf1")
    val emb = Tables.embeddings(spark, d).localCheckpoint(true)
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = Similarity.nearDupPairs(emb, "vec_id", "embedding", tau = 0.4).count()
      val t1 = System.nanoTime()
      val n2 = Similarity.nearDupPairs(emb, "vec_id", "embedding", tau = 0.4,
        maxKernelElements = 0).count()
      val t2 = System.nanoTime()
      println(f"[kp] run$r kernel=${(t1-t0)/1e9}%.2fs ($n pairs) cross=${(t2-t1)/1e9}%.2fs ($n2)")
    }
    spark.stop()
  }
}
