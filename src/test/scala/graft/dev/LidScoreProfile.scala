package graft.dev

import org.apache.spark.sql.functions._

/** Where does LangId.score spend its wall? features vs margins vs
  * argmax, timed as separate actions at a given SF.
  */
object LidScoreProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    val latin = "abcdefghijklmnopqrstuvwxyz"
    val cls = pmod(col("doc_id"), lit(4L))
    val planted = graft.core.Tables.documents(spark, d).select(
      col("doc_id"),
      concat(lit("L"), cls.cast("string")).as("lang_true"),
      when(cls === 1, translate(lower(col("text")), latin, graft.queries.TextQueries10.Greek))
        .when(cls === 2, translate(lower(col("text")), latin, graft.queries.TextQueries10.Cyrillic))
        .when(cls === 3, translate(lower(col("text")), latin, graft.queries.TextQueries10.Hiragana))
        .otherwise(lower(col("text"))).as("text")).localCheckpoint(true)
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[lidprof] $tag ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    val model = t("train")(graft.operators.LangId.train(
      planted.where(col("doc_id") % 5 === 0), "lang_true"))
    val feat = t("features+count")(
      graft.operators.LangId.features(planted).localCheckpoint(true))
    t("score-full")(graft.operators.LangId.score(planted, model)
      .write.format("noop").mode("overwrite").save())
    t("score-full-again")(graft.operators.LangId.score(planted, model)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
