package graft.operators

import org.apache.spark.sql.functions._
import graft.core.Tables

/** A/B the dup-gram join strategy at one SF (dev-only). */
object SpanJoinAB {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32)
    val d = args.headOption.getOrElse("/tmp/graft_scale_r10/sf10")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ab] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables.documents(spark, d)
    docs.count()
    def occ = SubstringDedup.gramOccurrences(docs, 8)
    time("grams alone")(noop(occ))
    def gs = occ.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 2).select(col("g"))
    time("agg alone")(noop(gs))
    time("join bcast 1")(noop(occ.join(broadcast(gs), Seq("g")).select(col("doc_id"), col("pos"))))
    time("join bcast 2")(noop(occ.join(broadcast(gs), Seq("g")).select(col("doc_id"), col("pos"))))
    time("join shuffle_hash")(noop(occ.join(gs.hint("shuffle_hash"), Seq("g")).select(col("doc_id"), col("pos"))))
    time("join merge")(noop(occ.join(gs.hint("merge"), Seq("g")).select(col("doc_id"), col("pos"))))
    time("join default")(noop(occ.join(gs, Seq("g")).select(col("doc_id"), col("pos"))))
    spark.stop()
  }
}
