package graft.demo

import graft.load.Load
import org.apache.spark.sql.functions._

/** Drive the review-fixed Load contract + minhash null safety live. */
object LoadFixDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(4)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("loadfix").toString + "/t"

    println("r1: " + Load.replaceTable(spark, Seq(1, 2, 3).toDF("v"), dir))
    // failing job mid-load → previous contents must survive
    val bad = Seq("oops").toDF("s").select(col("s").cast("long").as("v"))
    println("r2 failed: " + Load.replaceTable(spark, bad, dir).isFailure)
    println("preserved: " + spark.read.parquet(dir).as[Long].collect().sorted.toSeq)
    // overwrite again: backup/staging dirs must not linger
    println("r3: " + Load.replaceTable(spark, Seq(7L).toDF("v"), dir))
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName).sorted.toSeq
    println("dirs after swap: " + parent)

    // minhash over an all-null token array: null signature, no NPE
    val nulls = Seq(Tuple1(Seq(null.asInstanceOf[String]))).toDF("sh")
    val sig = nulls.select(graft.functions.TextFunctions.minhashSignature(col("sh"), 16).as("sig"))
    println("all-null minhash sig is null: " + sig.head().isNullAt(0))

    // LSH on 32-dim vectors (not 64): buckets must spread, not collapse to 0
    val vecs = (1 to 100).map(i => (i.toLong, Array.fill(32)(((i * 7 + 3) % 11 - 5).toFloat))).toDF("vec_id", "embedding")
    val buckets = graft.operators.Similarity.lshBuckets(vecs, "vec_id", "embedding", tables = 4, bits = 4)
    val distinctBuckets = buckets.select("table", "bucket").distinct().count()
    println(s"32-dim LSH distinct (table,bucket) combos: $distinctBuckets (collapse would be 4)")
    spark.stop()
  }
}
