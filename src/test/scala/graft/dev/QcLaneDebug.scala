package graft.dev

import org.apache.spark.sql.functions._

object QcLaneDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(8)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs0 = graft.core.Tables.documents(spark, "/root/testdata/sf0.001").limit(120)
    val m = pmod($"doc_id", lit(4L)).cast("string")
    val docs = docs0.select($"doc_id", pmod($"doc_id", lit(2L)).as("label"),
      concat(coalesce($"text", lit("")),
        when(pmod($"doc_id", lit(2L)) === 1,
          concat(lit(" qga"), m, lit(" qgb"), m, lit(" qgc"), m))
          .otherwise(concat(lit(" qba"), m, lit(" qbb"), m, lit(" qbc"), m)))
        .as("text")).localCheckpoint(true)
    for (it <- Seq(1, 2, 6)) {
      val mem = graft.operators.QualityClassifier.train(docs, "label", iters = it).weights
      val dist = graft.operators.QualityClassifier.train(docs, "label", iters = it,
        maxDriverRows = 0L).weights
      val diffs = mem.indices.filter(i => mem(i) != dist(i))
      println(s"[qcdbg] iters=$it ndiff=${diffs.size} " +
        diffs.take(3).map(i => s"b=$i mem=${mem(i)} dist=${dist(i)}").mkString(" | "))
    }
    spark.stop()
  }
}
