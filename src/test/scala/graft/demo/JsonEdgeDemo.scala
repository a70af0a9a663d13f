package graft.demo

import org.apache.spark.sql.functions._

/** Probe: JSON-extraction edge parity — missing key, malformed JSON,
  * null input — Spark get_json_object vs what the DuckDB oracle does. */
object JsonEdgeDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(2)
    import spark.implicits._
    val edge = Seq(
      (1L, """{"k": 42}"""), (2L, """{"other": 1}"""),
      (3L, """not json at all"""), (4L, null.asInstanceOf[String]),
      (5L, """{"k": "str"}""")
    ).toDF("id", "props")
    edge.withColumn("k", get_json_object(col("props"), "$.k").try_cast("long"))
      .select("id", "k").collect().sortBy(_.getLong(0))
      .foreach(r => println(s"spark id=${r.getLong(0)} k=${if (r.isNullAt(1)) "NULL" else r.getLong(1)}"))
    spark.stop()
  }
}
