package graft.ingest

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class RobustSpec extends SparkTestBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_robust").toString

  test("readEvolved unions drops with added columns; old drops read null") {
    import spark.implicits._
    val root = tmp()
    // drop 1: (id, v) — the original schema
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$root/d1")
    // drop 2: (id, v, lang) — a column added later
    Seq((3L, "c", "en")).toDF("id", "v", "lang")
      .write.parquet(s"$root/d2")
    val df = Robust.readEvolved(spark, Seq(s"$root/d1", s"$root/d2"))
    assert(df.columns.toSet == Set("id", "v", "lang"))
    assert(df.count() == 3)
    assert(df.where(col("lang").isNull).count() == 2)
    assert(df.where(col("id") === 3L).select("lang").head.getString(0) == "en")
  }

  test("readEvolved keeps pushdown: filter on a common column prunes files") {
    import spark.implicits._
    val root = tmp()
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$root/d1")
    Seq((2L, "b", "en")).toDF("id", "v", "lang").write.parquet(s"$root/d2")
    val df = Robust.readEvolved(spark, Seq(s"$root/d1", s"$root/d2"))
      .where(col("id") === 1L)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(id,1)"),
      s"mergeSchema read lost pushdown:\n${plan.take(1500)}")
    assert(df.count() == 1)
  }

  test("audited csv: clean rows parse, malformed rows quarantine with raw text") {
    val dir = tmp()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "feed.csv"),
      "id,qty,name\n1,10,alpha\n2,notanumber,beta\n3,30,gamma\nrubbish line\n"
        .getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("qty", LongType),
      StructField("name", StringType)))
    val r = Robust.AuditedReads.csv(spark, dir, schema)
    assert(r.good.count() == 2)
    assert(r.good.columns.toSeq == Seq("id", "qty", "name"))
    assert(r.good.agg(sum("qty")).head.getLong(0) == 40L)
    val bad = r.quarantine.collect().map(_.getString(0)).toSet
    assert(bad.size == 2)
    assert(bad.exists(_.contains("notanumber")), s"quarantine lost the raw line: $bad")
    assert(bad.exists(_.contains("rubbish")), s"quarantine lost the raw line: $bad")
  }

  test("audited json: type mismatch and broken syntax both quarantine") {
    val dir = tmp()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "feed.json"),
      ("""{"id": 1, "qty": 10}""" + "\n" +
        """{"id": 2, "qty": "ten"}""" + "\n" +
        """{"id": 3 broken""" + "\n" +
        """{"id": 4, "qty": 40}""" + "\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("qty", LongType)))
    val r = Robust.AuditedReads.json(spark, dir, schema)
    assert(r.good.count() == 2)
    assert(r.good.agg(sum("qty")).head.getLong(0) == 50L)
    assert(r.quarantine.count() == 2)
  }

  test("audited reads refuse a schema that claims the corrupt column") {
    val schema = StructType(Seq(StructField("_corrupt_record", StringType)))
    val e = intercept[IllegalArgumentException] {
      Robust.AuditedReads.csv(spark, "/nonexistent", schema)
    }
    assert(e.getMessage.contains("_corrupt_record"))
  }
}
