package graft.queries
// (queries package for coOrderPairs access; dev-only probe)

import org.apache.spark.sql.functions._

/** Dev-only phase split of q106 (PageRank over the co-order graph):
  * edge build / checkpoint, arc checkpoint, PageRank loop, final top-k
  * — so the optimization target is measured, not guessed (guide §1).
  *
  * Usage: sbt "Test/runMain graft.queries.PrPhaseProbe [sfDir] [rounds]"
  * (declared in graft.queries for coOrderPairs access; lives under dev/)
  */
object PrPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prphase] $label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    for (r <- 1 to rounds) {
      println(s"[prphase] ---- round $r ----")
      val edges = t("coOrderPairs+distinct (lazy)") {
        Relational5.coOrderPairs(spark, sfDir).distinct()
      }
      val ranked = t("ranks (3 iters) full") {
        val df = graft.operators.PageRank
          .ranks(graft.operators.PageRank.bothDirections(edges), iters = 3)
          .orderBy(col("rank").desc, col("vertex"))
          .limit(10)
          .select(col("vertex").as("part"), col("rank"))
        df.write.format("noop").mode("overwrite").save()
        df
      }
      graft.operators.Lineage.release(ranked, blocking = true)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
