package graft.demo

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

/** Drive the second-round review fixes live. */
object ReviewFix2Demo {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(4)
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sf)

    // empty query set: must be lazily empty, not a plan-time crash
    val none = emb.where($"vec_id" < 0)
    println("empty-query lshTopK rows: " + Similarity.lshTopK(emb, none, "vec_id", "embedding", 5).count())
    println("empty-corpus lshTopK rows: " + Similarity.lshTopK(none, none, "vec_id", "embedding", 5).count())

    // normal path still healthy after the dims-sharing change
    val top = Similarity.lshTopK(emb, emb.where($"vec_id" === 0), "vec_id", "embedding", 5)
    println("normal lshTopK rows for one query: " + top.count())

    // null-vector head row: inferDims must skip it
    val withNull = Seq((9999L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
      .unionByName(emb.select($"vec_id", $"embedding").limit(20))
    println("null-first-vector lshTopK rows: " +
      Similarity.lshTopK(withNull, withNull.where($"vec_id" === 0), "vec_id", "embedding", 3).count())
    spark.stop()
  }
}
