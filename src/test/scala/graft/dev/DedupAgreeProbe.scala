package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup

/** Dev probe: cross-family agreement of the xxhash fast paths (q36/q55)
  * with their oracle-checked md5 twins (q79/q34) — the numbers that
  * pick the reduced-assertion agreement floors.
  */
object DedupAgreeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)

    val md5 = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleN = 3, bands = 8, rowsPerBand = 2, tau = 0.3)
      .select(col("doc_a"), col("doc_b"), col("jaccard")).cache()
    val fast = Dedup.minhashLshFast(docs, "doc_id", "text",
      shingleN = 3, bands = 8, rowsPerBand = 2, tau = 0.3)
      .select(col("doc_a"), col("doc_b")).cache()
    val nMd5 = md5.count(); val nFast = fast.count()
    val hi = md5.where(col("jaccard") >= 0.7).select("doc_a", "doc_b").cache()
    val nHi = hi.count()
    val nHiHit = hi.join(fast, Seq("doc_a", "doc_b"), "left_semi").count()
    println(s"[probe] minhash: md5=$nMd5 fast=$nFast hi(j>=0.7)=$nHi fastHitHi=$nHiHit")

    val portable = Dedup.simhash60Pairs(docs, "doc_id", "text", maxHamming = 5)
      .select(col("doc_a"), col("doc_b"), col("hamming")).cache()
    val xx = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 5)
      .select(col("doc_a"), col("doc_b")).cache()
    val nPort = portable.count(); val nXx = xx.count()
    for (h <- Seq(0, 1, 2, 3)) {
      val p = portable.where(col("hamming") <= h).select("doc_a", "doc_b")
      val n = p.count()
      val hit = p.join(xx, Seq("doc_a", "doc_b"), "left_semi").count()
      println(s"[probe] simhash h<=$h: portable=$n xxHit=$hit")
    }
    println(s"[probe] simhash totals: portable=$nPort xx=$nXx")
    spark.stop()
  }
}
