package graft.demo

import java.time.LocalDate

import graft.core.Sessions
import graft.ingest.Workbook
import graft.load.Load
import graft.pipeline.HpvPipeline

/** Runnable end-to-end sample of the public HPV surface: staged workbook
  * CSVs → transform → atomic load → read-back. Doubles as the /verify
  * drive target: `sbt "Test/runMain graft.demo.HpvDemo <csv...> <dest>"`.
  */
object HpvDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(4)
    val dest = args.last
    val wbs = args.init.toSeq.map(p => Workbook.readCsvGrid(spark, p))
    println("A1 captured: " + wbs.map(_.a1).mkString(" | "))
    val fact = HpvPipeline.transform(wbs, LocalDate.of(2026, 8, 12))
    fact.orderBy("ACADEMIC_YEAR_END_DATE", "BOROUGH_NAME", "YEAR_GROUP_NUMBER", "GENDER_NAME")
      .show(30, false)
    println("load: " + Load.replaceTable(spark, fact, dest))
    println("readback rows: " + spark.read.parquet(dest).count())

    // PROBE 1: duplicate pivot grain must fail loud with offending keys
    val dup = Workbook.fromGrid(spark, Seq(
      Seq("x September 2023 to August 2024"), Seq(""),
      Seq("Local authority", "Year 8 females: Number", "Year 8 females: Number vaccinated"),
      Seq("camden", "1", "2"), Seq("Camden", "3", "4")))
    try {
      HpvPipeline.transform(Seq(dup), LocalDate.now())
      println("PROBE1: NO ERROR (BAD)")
    } catch {
      case e: IllegalStateException => println("PROBE1 fail-loud OK: " + e.getMessage.take(140))
    }

    // PROBE 2: failed load preserves destination contents
    val bad = spark.range(1).selectExpr("CAST('oops' AS LONG) AS v")
    println("PROBE2 load failed: " + Load.replaceTable(spark, bad, dest).isFailure)
    println("PROBE2 preserved rows: " + spark.read.parquet(dest).count())

    // PROBE 3: grid shorter than the header offset
    try {
      Workbook.fromGrid(spark, Seq(Seq("only one row")))
      println("PROBE3: NO ERROR (BAD)")
    } catch {
      case e: IllegalArgumentException => println("PROBE3 OK: " + e.getMessage)
    }
    spark.stop()
  }
}
