package graft.demo

import org.apache.spark.sql.functions._

/** Drive: graft functions from pure SQL over real fixture views, plus
  * the flatMapGroupsWithState sessionizer over a real file stream. */
object SqlSurfaceDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(4)
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    graft.core.Tables.registerAll(spark, sf)

    // pure-SQL near-dup over embeddings using registered graft functions
    spark.sql("""
      WITH e AS (SELECT vec_id, graft_normalize(transform(embedding, x -> CAST(x AS DOUBLE))) vn FROM embeddings)
      SELECT a.vec_id, b.vec_id, round(graft_dot(a.vn, b.vn), 4) AS sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE graft_dot(a.vn, b.vn) >= 0.45
      ORDER BY sim DESC LIMIT 5
    """).show()

    // pure-SQL minhash signatures over documents
    spark.sql("""
      SELECT doc_id, graft_minhash_sig(
        array_distinct(regexp_extract_all(lower(text), '\\S+', 0)), 4)[0] AS mh0
      FROM documents LIMIT 3
    """).show(false)

    // probe: unknown function error names alternatives
    try spark.sql("SELECT graft_dotx(array(1d), array(1d))").collect()
    catch { case e: Exception => println("PROBE unknown fn: " + e.getMessage.linesIterator.next().take(120)) }

    // flatMapGroupsWithState over a real file stream (2 micro-batches)
    val ev = graft.core.Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val staged = java.nio.file.Files.createTempDirectory("sess_stream").toString
    ev.where($"ts" < "2024-01-15").repartition(1).write.mode("overwrite").parquet(staged)
    ev.where($"ts" >= "2024-01-15").repartition(1).write.mode("append").parquet(staged)
    val stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(staged)
    import graft.streaming.EventStreams
    val q = EventStreams.completedSessions(
        stream.as[EventStreams.Event], gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_demo").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val emitted = spark.table("sess_demo")
    println("closed sessions emitted: " + emitted.count() +
      " | users: " + emitted.select("user_id").distinct().count() +
      " | max n_events: " + emitted.agg(max($"n_events")).head().getLong(0))
    spark.stop()
  }
}
