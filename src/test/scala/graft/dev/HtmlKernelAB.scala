package graft.dev

import org.apache.spark.sql.functions._

/** Dev-only A/B: the fused HtmlExtractText kernel vs the nine-pass
  * regex chain, on real-page-SIZED documents (fixture docs are ~1 KB;
  * crawl pages are 50-200 KB, where java.util.regex non-greedy span
  * scans hurt). Synthesizes `nDocs` documents of ~`blocks` HTML blocks
  * each from the sf0.1 corpus text, then times both lanes over
  * identical input (count(length) forces full evaluation).
  *
  * Usage: sbt "Test/runMain graft.dev.HtmlKernelAB [sfDir] [nDocs] [blocks]"
  */
object HtmlKernelAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nDocs = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
    val blocks = args.drop(2).headOption.map(_.toInt).getOrElse(64)
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Html

    // one ~page-sized doc per row: `blocks` repeated block templates
    // wrapping fixture text, plus a script/style/comment head
    val base = graft.core.Tables.documents(spark, sfDir)
      .limit(nDocs).select(col("doc_id"), coalesce(col("text"), lit("")).as("t"))
    val block = concat(
      lit("<div class=\"b\"><h2>s&amp;"), col("doc_id"), lit("</h2><p>"),
      col("t"), lit(" &lt;x&gt;</p><!-- c --><ul><li>i</li></ul></div>"))
    val page = concat(
      lit("<html><head><title>T</title><style>.a{x:1}</style>"),
      lit("<script>if(a<b&&c>d){t(\"<p>\");}</script></head><body>"),
      array_join(transform(sequence(lit(1), lit(blocks)), _ => block), ""),
      lit("</body></html>"))
    val docs = base.select(col("doc_id"), page.as("h")).localCheckpoint()
    val bytes = docs.agg(sum(length(col("h")))).head.getLong(0)
    println(s"[htmlab] docs=$nDocs blocks=$blocks totalChars=$bytes (~${bytes / nDocs / 1024} KB/doc)")

    def time(tag: String)(c: org.apache.spark.sql.Column): Long = {
      val t0 = System.nanoTime()
      val n = docs.agg(sum(length(c))).head.getLong(0)
      println(f"[htmlab] $tag%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s (outChars=$n)")
      n
    }
    // interleaved, 2 rounds each, to cancel weather
    var a = 0L; var b = 0L
    for (_ <- 1 to 2) {
      a = time("regex-chain")(Html.extractText(col("h")))
      b = time("fused-kernel")(Html.extractTextFast(col("h")))
    }
    assert(a == b, s"lanes disagree on output size: $a vs $b")
    println("[htmlab] identical output chars across lanes")
    spark.stop()
  }
}
