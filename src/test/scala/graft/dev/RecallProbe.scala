package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Ivf, IvfPq, Pq, Similarity}

/** Dev probe: measured recall@10 of the three ANN paths vs the exact
  * brute force, and the HLL relative error per group, at a given SF dir
  * — the numbers that pick the reduced-assertion oracle floors.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, sfDir)
    val qs = emb.where(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))

    def recall(name: String, ann: org.apache.spark.sql.DataFrame): Unit = {
      val r = exact
        .join(ann.select(col("query_id"), col("neighbor_id")).distinct()
          .withColumn("_hit", lit(1L)), Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg((sum(coalesce(col("_hit"), lit(0L))) / count(lit(1))).as("recall"))
        .orderBy("query_id")
        .collect()
      println(s"[probe] $name recalls: " +
        r.map(x => f"q${x.getLong(0)}=${x.getDouble(1)}%.2f").mkString(" "))
    }

    recall("ivf", Ivf.topK(emb, qs, "vec_id", "embedding", k = 10, nCentroids = 16, nProbe = 4))
    recall("pq", {
      val cb = Pq.train(emb, "vec_id", "embedding")
      Pq.adcTopK(emb, qs, "vec_id", "embedding", cb, topK = 10)
    })
    recall("ivfpq", IvfPq.topK(emb, qs, "vec_id", "embedding", k = 10, nCentroids = 16, nProbe = 4))

    val hll = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_orderkey")).distinct()
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("exact"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx"))
      .select(col("l_returnflag"), col("exact"), col("approx"),
        (abs(col("approx") - col("exact")) / col("exact")).as("rel_err"))
      .collect()
    println("[probe] hll: " + hll.map(r =>
      f"${r.getString(0)}=${r.getDouble(3)}%.4f").mkString(" "))
    spark.stop()
  }
}
