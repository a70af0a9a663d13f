package graft.demo

import org.apache.spark.sql.functions._
import graft.load.Load
import graft.operators.Similarity

/** Drive: csv sink replace + rollback; LSH-bucketed near-dup pairs. */
object SinkNearDupDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(4)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sink_demo").toString + "/t"

    // csv replace, then failing csv replace → previous csv preserved
    println("csv r1: " + Load.replaceTable(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "name"), dir, "csv"))
    val bad = Seq("x").toDF("s").select(col("s").cast("long").as("id"), lit("z").as("name"))
    println("csv r2 failed: " + Load.replaceTable(spark, bad, dir, "csv").isFailure)
    val back = spark.read.option("header", "true").csv(dir)
    println("csv preserved rows: " + back.count() + " cols: " + back.columns.toSeq)
    // PROBE: bogus format name
    println("bogus format: " + Load.replaceTable(spark, Seq(1).toDF("v"), dir + "2", "no_such_format").isFailure)

    // approx near-dup vs exact on real embeddings at sf0.01
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val exact = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val approx = Similarity.nearDupPairsApprox(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    println(s"near-dup: exact=${exact.size} approx=${approx.size} " +
      s"subset=${approx.subsetOf(exact)} recall=${if (exact.isEmpty) 1.0 else (exact & approx).size.toDouble / exact.size}")
    spark.stop()
  }
}
