package graft.dev
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Components, Similarity}
object ClosureProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/tmp/graft_sf1")
    val emb = Tables.embeddings(spark, d).localCheckpoint(true)
    for (r <- 1 to 2) {
      val t0 = System.nanoTime()
      val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding", tau = 0.4)
        .localCheckpoint(true)
      val t1 = System.nanoTime()
      val g = Components.dupGroups(pairs, "id_a", "id_b")
      g.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[cp] run$r pairs=${(t1-t0)/1e9}%.2fs closure=${(t2-t1)/1e9}%.2fs")
    }
    spark.stop()
  }
}
