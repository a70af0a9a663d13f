package graft.demo

import graft.ingest.Xlsx
import graft.load.Load
import graft.pipeline.HpvPipeline

/** Drive: glob a directory of xlsx workbooks → HPV pipeline → load. */
object XlsxDemo {
  def main(args: Array[String]): Unit = {
    val Array(dir, dest) = args
    val spark = graft.core.Sessions.local(4)
    val paths = Xlsx.glob(dir).filterNot(_.contains("broken"))
    println("globbed: " + paths.map(p => new java.io.File(p).getName).mkString(", "))
    val wbs = paths.map(p => Xlsx.readWorkbook(spark, p, "Local_authority"))
    println("A1s: " + wbs.map(_.a1).mkString(" | "))
    val fact = HpvPipeline.transform(wbs, java.time.LocalDate.of(2026, 8, 12))
    fact.orderBy("ACADEMIC_YEAR_END_DATE", "BOROUGH_NAME", "YEAR_GROUP_NUMBER", "GENDER_NAME")
      .show(30, false)
    println("load: " + Load.replaceTable(spark, fact, dest))
    // PROBE: corrupted xlsx → named error, not a crash elsewhere
    try { Xlsx.readGrid(s"$dir/broken.xlsx", "Local_authority"); println("PROBE NO ERROR (BAD)") }
    catch { case e: Exception => println("PROBE corrupted-zip error OK: " + e.getClass.getSimpleName) }
    spark.stop()
  }
}
