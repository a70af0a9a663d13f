package graft.load

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import scala.util.{Failure, Success}

/** K1-K5: staged atomic replace — success reports rows; failure leaves
  * the previous destination contents intact (the reference's
  * TRUNCATE+ROLLBACK contract, database_util.py:37-57).
  */
class LoadSpec extends SparkTestBase {
  import spark.implicits._

  test("replaceTable overwrites atomically and reports row count") {
    val dir = java.nio.file.Files.createTempDirectory("graft_load").toString + "/t"
    val r1 = Load.replaceTable(spark, Seq(1, 2, 3).toDF("v"), dir)
    assert(r1 == Success(LoadReport(3, dir)))
    val r2 = Load.replaceTable(spark, Seq(9, 10).toDF("v"), dir)
    assert(r2 == Success(LoadReport(2, dir)))
    assert(spark.read.parquet(dir).as[Int].collect().sorted.toSeq == Seq(9, 10))
  }

  test("csv and json sinks round-trip through the same staged replace") {
    for (fmt <- Seq("csv", "json")) {
      val dir = java.nio.file.Files.createTempDirectory("graft_load").toString + s"/t_$fmt"
      val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      val r = Load.replaceTable(spark, df, dir, format = fmt)
      assert(r.map(_.rows) == Success(2L), s"$fmt: $r")
      val back = (if (fmt == "csv") spark.read.option("header", "true") else spark.read)
        .format(fmt).load(dir)
      assert(back.count() == 2 && back.columns.sorted.toSeq == Seq("id", "name"))
    }
  }

  test("failed load preserves previous destination contents (rollback)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_load").toString + "/t"
    assert(Load.replaceTable(spark, Seq(1, 2, 3).toDF("v"), dir).isSuccess)
    // ANSI cast failure mid-job: the staged write throws, dest untouched
    val bad = Seq("not-a-number").toDF("s").select(col("s").cast("long").as("v"))
    Load.replaceTable(spark, bad, dir) match {
      case Failure(_) => // expected
      case Success(r) => fail(s"expected failure, got $r")
    }
    assert(spark.read.parquet(dir).as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }
}
