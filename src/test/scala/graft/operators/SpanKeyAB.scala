package graft.operators

import org.apache.spark.sql.functions._
import graft.core.Tables

/** A/B the gram-key width for the dup-start pipeline (dev-only):
  * exact text keys vs two 60-bit md5-derived longs.
  */
object SpanKeyAB {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32)
    val d = args.headOption.getOrElse("/tmp/graft_scale_r10/sf10")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[kab] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables.documents(spark, d)
    docs.count()
    def occText = SubstringDedup.gramOccurrences(docs, 8)
    def textStarts = {
      val o = occText
      val gs = o.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
        .where(col("cnt") >= 2).select(col("g"))
      o.join(gs.hint("shuffle_hash"), Seq("g")).select(col("doc_id"), col("pos"))
    }
    def occHash = occText.select(col("doc_id"), col("pos"),
      expr("cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint)").as("h1"),
      expr("cast(conv(substring(md5(g), 16, 15), 16, 10) as bigint)").as("h2"))
    def hashStarts = {
      val o = occHash
      val gs = o.groupBy(col("h1"), col("h2")).agg(count(lit(1)).as("cnt"))
        .where(col("cnt") >= 2).select(col("h1"), col("h2"))
      o.join(gs.hint("shuffle_hash"), Seq("h1", "h2")).select(col("doc_id"), col("pos"))
    }
    for (round <- 1 to 4) {
      time(s"text keys $round")(noop(textStarts))
      time(s"md5 keys $round")(noop(hashStarts))
    }
    // sanity: identical dup-start sets on this fixture
    val a = textStarts.distinct().count()
    val b = hashStarts.distinct().count()
    println(s"[kab] starts text=$a md5=$b equal=${a == b}")
    spark.stop()
  }
}
