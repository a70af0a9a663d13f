package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: attribute q112/q113 time to train / encode / probe.
  * Usage: sbt "Test/runMain graft.dev.Q112Probe [sfDir]"
  */
object Q112Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }

    val emb = graft.core.Tables.embeddings(spark, sfDir)
    timed("emb count") { emb.count() }
    val cb = timed("pq train") {
      graft.operators.Pq.train(emb, "vec_id", "embedding")
    }
    val coded = timed("pq encode plan") {
      graft.operators.Pq.encode(emb, "vec_id", "embedding", cb)
    }
    timed("pq encode exec") {
      coded.write.format("noop").mode("overwrite").save()
    }
    timed("pq adcTopK full") {
      graft.operators.Pq.adcTopK(
          emb, emb.where(col("vec_id") < 5), "vec_id", "embedding", cb, topK = 10)
        .write.format("noop").mode("overwrite").save()
    }
    timed("ivfpq full") {
      graft.operators.IvfPq.topK(
          emb, emb.where(col("vec_id") < 5), "vec_id", "embedding",
          k = 10, nCentroids = 16, nProbe = 4)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
