package graft.operators

import graft.core.Tables

/** A/B the gram-key representation at WIDE gram widths (dev-only):
  * k=20 gram text (~120 chars) vs 16-byte binary md5 keys, the
  * round-11 flag (`hashGramKeys`). Round 10 measured md5 keys ~2×
  * SLOWER at k=8; the survey's analysis says the lane flips once the
  * text key dwarfs the digest — this measures the flip.
  */
object WideGramAB {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32)
    val d = args.headOption.getOrElse("/tmp/graft_scale_r10/sf3")
    val k = args.lift(1).map(_.toInt).getOrElse(20)
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[wab] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables.documents(spark, d)
    docs.count()
    for (round <- 1 to 3) {
      time(s"k=$k spans text keys $round")(noop(SubstringDedup.duplicatedSpans(docs, k)))
      time(s"k=$k spans md5 keys  $round")(noop(
        SubstringDedup.duplicatedSpans(docs, k, hashGramKeys = true)))
    }
    // sanity: identical span sets
    val a = SubstringDedup.duplicatedSpans(docs, k).distinct().count()
    val b = SubstringDedup.duplicatedSpans(docs, k, hashGramKeys = true).distinct().count()
    println(s"[wab] spans text=$a md5=$b equal=${a == b}")
    spark.stop()
  }
}
