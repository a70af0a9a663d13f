package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scratch bisect of duplicatedSpans stages at one SF (dev-only). */
object SpanBisect {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32)
    val d = args.headOption.getOrElse("/tmp/graft_scale_r10/sf10")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[bisect] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables.documents(spark, d)
    docs.count()
    val occ = SubstringDedup.gramOccurrences(docs, 8)
    val starts = SubstringDedup.duplicatedStarts(occ)
    time("dup starts noop")(noop(starts))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val ni = starts.select(col("doc_id"), col("pos"))
      .withColumn("ni",
        when(lag(col("pos"), 1).over(w).isNull
          || col("pos") - lag(col("pos"), 1).over(w) > 8, 1L).otherwise(0L))
    time("window lag noop")(noop(ni))
    val isl = ni.withColumn("isl",
      sum(col("ni")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    time("window sum noop")(noop(isl))
    val agg = isl.groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).as("span_start"), (max(col("pos")) + 7).as("span_end"))
    time("final agg noop")(noop(agg))
    spark.stop()
  }
}
