package graft.demo
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
object Q35Profile {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[q35prof] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32)
    val d = "/root/testdata/sf0.1"
    val df = graft.core.Tables.documents(spark, d)
    t("read+count")(df.count())
    val toks = df.select(col("doc_id"), col("source").as("blk"), tokens(col("text")).as("toks"))
    t("tokenize")(toks.write.format("noop").mode("overwrite").save())
    val s = toks.where(size(col("toks")) >= 2)
      .select(col("doc_id"), col("blk"), shingles(col("toks"), 2).as("sh"))
    t("shingles")(s.write.format("noop").mode("overwrite").save())
    val ex = s.select(col("doc_id"), col("blk"), explode(col("sh")).as("g0"))
      .select(col("doc_id"), col("blk"), xxhash64(col("g0")).as("g"))
    t("explode")(ex.write.format("noop").mode("overwrite").save())
    val joined = ex.as("x").join(ex.as("y"),
      col("x.blk") === col("y.blk") && col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
    t("join+count")(println("pairs=" + joined.count()))
    t("full_q35")(graft.Registry.byName("q35_dedup_ngram_blocked").run(spark, d)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
