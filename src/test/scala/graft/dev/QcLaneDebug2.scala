package graft.dev

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

object QcLaneDebug2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(8)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val Dec = DecimalType(38, 18)
    val docs0 = graft.core.Tables.documents(spark, "/root/testdata/sf0.001").limit(120)
    val m4 = pmod($"doc_id", lit(4L)).cast("string")
    val docs = docs0.select($"doc_id", pmod($"doc_id", lit(2L)).as("label"),
      concat(coalesce($"text", lit("")),
        when(pmod($"doc_id", lit(2L)) === 1,
          concat(lit(" qga"), m4, lit(" qgb"), m4, lit(" qgc"), m4))
          .otherwise(concat(lit(" qba"), m4, lit(" qbb"), m4, lit(" qbc"), m4)))
        .as("text")).localCheckpoint(true)
    // weights after 1 iteration (both lanes agree)
    val w = graft.operators.QualityClassifier.train(docs, "label", iters = 1).weights
    val nBuckets = w.length - 1
    val labels = docs.select($"doc_id".cast("long").as("doc_id"), $"label".cast("double").as("y"))
    val feat = graft.operators.QualityClassifier.features(docs, nBuckets)
      .join(labels, "doc_id").localCheckpoint()
    // distributed margin
    val wcol = element_at(typedlit(w.toSeq), ($"b" + 1).cast("int"))
    val distM = feat.select($"doc_id", ($"x" * wcol).cast(Dec).as("c"))
      .groupBy($"doc_id").agg(sum($"c").cast("double").as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // in-memory margin
    val rows = feat.select($"doc_id", $"b", $"x").collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getDouble(2)))
    def dec18(v: Double) = java.math.BigDecimal.valueOf(v).setScale(18, java.math.RoundingMode.HALF_UP)
    val memM = rows.groupBy(_._1).map { case (d, rs) =>
      var acc = java.math.BigDecimal.ZERO.setScale(18)
      rs.foreach { case (_, b, x) => acc = acc.add(dec18(x * w(b))) }
      d -> acc.doubleValue
    }
    val diff = distM.keys.filter(d => distM(d) != memM(d)).toSeq.sorted
    println(s"[qcdbg2] margin diffs: ${diff.size}")
    diff.take(3).foreach { d =>
      println(s"[qcdbg2] doc=$d dist=${distM(d)} mem=${memM(d)}")
      // recompute the decimal sum symbolically for this doc
      val rs = rows.filter(_._1 == d)
      var acc = java.math.BigDecimal.ZERO.setScale(18)
      rs.foreach { case (_, b, x) => acc = acc.add(dec18(x * w(b))) }
      println(s"[qcdbg2]   mem decimal=$acc nrows=${rs.length}")
      val dd = feat.where($"doc_id" === d)
        .select(($"x" * wcol).cast(Dec).as("c"))
        .agg(sum($"c")).collect()(0)
      println(s"[qcdbg2]   dist decimal=${dd.get(0)}")
    }
    spark.stop()
  }
}
