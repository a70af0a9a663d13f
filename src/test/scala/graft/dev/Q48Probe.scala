package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: attribute q48 (IVF) time to build phases vs probe.
  * Usage: sbt "Test/runMain graft.dev.Q48Probe [sfDir]"
  */
object Q48Probe {
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
    timed("warmup count") { emb.count() }
    val ix = timed("ivf build") {
      graft.operators.Ivf.build(emb, "vec_id", "embedding", nCentroids = 16)
    }
    timed("ivf probe") {
      graft.operators.Ivf.probe(ix._1, ix._2,
          emb.where(col("vec_id") < 5), "vec_id", "embedding", k = 10, nProbe = 4)
        .write.format("noop").mode("overwrite").save()
    }
    graft.operators.Ivf.release(ix)
    timed("ivf topK one-shot (q48 shape)") {
      graft.operators.Ivf.topK(emb, emb.where(col("vec_id") < 5),
          "vec_id", "embedding", k = 10, nCentroids = 16, nProbe = 4)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
