package graft.operators

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scratch profiler for the substring-dedup stages (dev-only). */
object SubstringProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32)
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = Tables.documents(spark, d)
    // warm the scan + codegen
    time("warm count")(docs.count())
    val occ = SubstringDedup.gramOccurrences(docs, 8)
    time("grams count")(occ.write.format("noop").mode("overwrite").save())
    time("grams count 2")(occ.write.format("noop").mode("overwrite").save())
    val dup = SubstringDedup.duplicatedStarts(occ)
    time("dupStarts count")(dup.write.format("noop").mode("overwrite").save())
    time("spans full")(SubstringDedup.duplicatedSpans(docs, 8).write.format("noop").mode("overwrite").save())
    time("spans full 2")(SubstringDedup.duplicatedSpans(docs, 8).write.format("noop").mode("overwrite").save())
    time("clean full")(SubstringDedup.cleanKeepFirst(docs, 8).write.format("noop").mode("overwrite").save())
    time("clean full 2")(SubstringDedup.cleanKeepFirst(docs, 8).write.format("noop").mode("overwrite").save())
    if (args.length > 1 && args(1) == "explain")
      SubstringDedup.duplicatedSpans(docs, 8).explain("formatted")
    spark.stop()
  }
}
