package graft.demo

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.load.Load

/** Drive the third-round review fixes live. */
object ReviewFix3Demo {
  def main(args: Array[String]): Unit = {
    // 1) create a session WITHOUT extensions first (pre-existing session case)
    val bare = graft.core.Sessions
      .configure(SparkSession.builder().master("local[4]"), 4).getOrCreate()
    bare.sparkContext.setLogLevel("WARN")
    val hadFn = try { bare.sql("SELECT graft_dot(array(1d), array(1d))").collect(); true }
      catch { case _: Exception => false }
    println("bare session has graft_dot before Sessions.local: " + hadFn)
    val s = graft.core.Sessions.local(4) // must register on the EXISTING session
    println("after Sessions.local, graft_dot works: " +
      (s.sql("SELECT graft_dot(array(2d), array(3d)) AS d").head().getDouble(0) == 6.0))
    println("DESCRIBE FUNCTION usage: " + s.sql("DESCRIBE FUNCTION graft_minhash_sig")
      .collect().map(_.getString(0)).find(_.startsWith("Usage")).getOrElse("MISSING"))

    import s.implicits._
    // 2) csv with embedded newline: count must be logical rows, not lines
    val dir = java.nio.file.Files.createTempDirectory("fix3").toString
    val tricky = Seq((1L, "a\nb"), (2L, "plain")).toDF("id", "name")
    println("newline csv report: " + Load.replaceTable(s, tricky, dir + "/csv1", "csv"))
    // 3) empty json: must succeed with rows=0, not AnalysisException
    val empty = Seq.empty[(Long, String)].toDF("id", "name")
    println("empty json report: " + Load.replaceTable(s, empty, dir + "/json1", "json"))

    // 4) minhash k diagnostics
    for (q <- Seq(
        "SELECT graft_minhash_sig(array('a'), id) FROM range(1)",
        "SELECT graft_minhash_sig(array('a'), CAST(4 AS TINYINT))")) {
      try { s.sql(q).collect(); println("OK: " + q.take(60)) }
      catch { case e: Exception => println("ERR: " + e.getMessage.linesIterator.next().take(120)) }
    }
    s.stop()
  }
}
