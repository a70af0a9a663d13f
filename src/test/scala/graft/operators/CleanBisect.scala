package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions.tokens

/** Scratch bisect of cleanKeepFirst stages at one SF (dev-only). */
object CleanBisect {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32)
    val d = args.headOption.getOrElse("/tmp/graft_scale_r10/sf10")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cb] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables.documents(spark, d)
    docs.count()
    val k = 8
    val tok = graft.core.Partitioning.fanOut(docs)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
    time("tok explode")(noop(tok))
    val nonFirst = SubstringDedup.nonFirstStarts(SubstringDedup.gramOccurrences(docs, k))
      .select(col("doc_id"), col("pos"), lit(1).as("flag"))
    time("nonFirst")(noop(nonFirst))
    val joined = tok.join(nonFirst, Seq("doc_id", "pos"), "left")
    time("left join")(noop(joined))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(k - 1), Window.currentRow)
    val cov = joined.withColumn("cov", max(coalesce(col("flag"), lit(0))).over(w))
    time("cov window")(noop(cov))
    val counts = cov.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("cov")).cast("long").as("removed_tokens"))
    time("count agg")(noop(counts))
    time("full clean")(noop(SubstringDedup.cleanKeepFirst(docs, k)))
    spark.stop()
  }
}
