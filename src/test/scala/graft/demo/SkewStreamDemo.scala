package graft.demo

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Skew

/** Drive: salted join/agg over fixture data + streaming dedup over a
  * real file stream of the events fixture. */
object SkewStreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(8)
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"

    // salted join vs plain join on real data: same row count + sample
    val l = Tables.lineitem(spark, sf).select(col("l_partkey").as("partkey"), col("l_quantity"))
    val p = Tables.part(spark, sf).select(col("p_partkey").as("partkey"), col("p_brand"))
    val plainN = l.join(p, Seq("partkey")).count()
    val saltedN = Skew.saltedJoin(l, p, "partkey", salts = 8).count()
    println(s"join rows: plain=$plainN salted=$saltedN equal=${plainN == saltedN}")

    val direct = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("q")).orderBy("l_returnflag").collect()
    val salted = Skew.saltedSumAgg(
      Tables.lineitem(spark, sf).withColumn("q0", col("l_quantity").cast("decimal(12,2)")),
      Seq("l_returnflag"), Seq("q0"), salts = 16)
      .orderBy("l_returnflag").collect()
    println("agg equal=" + direct.zip(salted).forall { case (a, b) =>
      a.get(0) == b.get(0) && a.getDecimal(1).compareTo(b.getDecimal(1)) == 0 })

    // streaming dedup over a file stream: duplicate the events file so
    // every event id arrives twice across micro-batches
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val staged = java.nio.file.Files.createTempDirectory("dedup_stream").toString
    ev.repartition(2).write.mode("overwrite").parquet(staged + "/b1")
    ev.repartition(3).write.mode("append").parquet(staged + "/b1") // every id twice
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(staged + "/b1")
    val q = graft.streaming.EventStreams.dedupedEvents(stream)
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val n = spark.table("dd").count()
    val distinctIds = spark.table("dd").select("event_id").distinct().count()
    println(s"stream dedup: input=${ev.count() * 2} emitted=$n distinct=$distinctIds (expect emitted==distinct==${ev.count()})")
    spark.stop()
  }
}
