package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: where does q144's time go — edge build, peel
  * rounds, or final degree count? Not part of the shipped surface.
  *
  * Usage: sbt "Test/runMain graft.dev.Q144Probe [sfDir]"
  */
object Q144Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    val pairs = graft.core.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2), size(col("ps"))),
          y => struct(x.as("u"), y.as("v"))))))
        .as("e"))
      .select(col("e.u"), col("e.v"))

    val e0 = time("edge build (distinct)") {
      val e = pairs.select(col("u").cast("long").as("a"), col("v").cast("long").as("b"))
        .where(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .distinct()
        .localCheckpoint(true)
      println(s"[probe] edges = ${e.count()}")
      e
    }
    var arcs = time("arc union checkpoint") {
      spark.createDataFrame(
        e0.union(e0.select(col("v").as("u"), col("u").as("v")))
          .localCheckpoint(true).rdd,
        e0.schema)
    }
    var round = 0
    var done = false
    while (!done && round < 50) {
      val bad = time(f"round $round%2d peel-set") {
        val b = arcs.groupBy(col("u")).agg(count(lit(1)).as("deg"))
          .where(col("deg") < 80).select(col("u").as("peel"))
          .localCheckpoint(true)
        spark.createDataFrame(b.rdd, b.schema)
      }
      val n = bad.count()
      println(s"[probe]   peeled $n vertices")
      if (n == 0) done = true
      else {
        arcs = time(f"round $round%2d arc filter") {
          val a = arcs
            .join(bad, arcs("u") === bad("peel"), "left_anti")
            .join(bad.select(col("peel").as("peel_v")),
              arcs("v") === col("peel_v"), "left_anti")
            .localCheckpoint(true)
          spark.createDataFrame(a.rdd, a.schema)
        }
        round += 1
      }
    }
    time("final degree count") {
      println(s"[probe] core vertices = " +
        arcs.groupBy(col("u")).agg(count(lit(1)).as("d")).count())
    }
    spark.stop()
  }
}
