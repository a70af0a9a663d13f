package graft.operators

import org.apache.spark.sql.functions._
import graft.core.Tables

/** A/B the incremental-probe index join strategy at one SF (dev-only). */
object IncJoinAB {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32)
    val d = args.headOption.getOrElse("/tmp/graft_scale_r10/sf10")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[iab] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables.documents(spark, d)
    docs.count()
    val batchPred = col("doc_id") % 4 === 3
    val corpus = docs.where(!batchPred)
    val batch = docs.where(batchPred)
    def index = SubstringDedup.gramIndex(corpus, 8)
    // identical key/payload shapes to cleanKeepFirstIncremental — the
    // production packed order and least()-merge, not a lookalike
    // (advice r10: a pos-only bfp + coalesce merge drifted the shape)
    def occB = SubstringDedup.gramOccurrences(batch, 8)
    def bStats = occB.groupBy(col("g"))
      .agg(min(SubstringDedup.packedOrder).as("bfp"), count(lit(1)).as("bcnt"))
    def mergedWith(ix: org.apache.spark.sql.DataFrame) = bStats
      .join(ix.select(col("g"), col("fp"), col("cnt")), Seq("g"), "left")
      .select(col("g"),
        least(col("bfp"), coalesce(col("fp"), lit(Long.MaxValue))).as("gfp"),
        (col("bcnt") + coalesce(col("cnt"), lit(0L))).as("gcnt"))
      .where(col("gcnt") >= 2)
    for (round <- 1 to 2) {
      time(s"merged shuffle_hash $round")(noop(mergedWith(index.hint("shuffle_hash"))))
      time(s"merged default $round")(noop(mergedWith(index)))
      time(s"full inc $round")(noop(SubstringDedup.cleanKeepFirstIncremental(index, batch, 8)))
    }
    spark.stop()
  }
}
