package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkTestBase {
  import spark.implicits._

  private def dailyTotals(raw: DataFrame): DataFrame =
    raw.groupBy($"day").agg(sum($"v").as("total"), count(lit(1)).as("n"))

  test("late delta refreshes only its partitions; result equals a full rebuild") {
    val root = java.nio.file.Files.createTempDirectory("graft_iagg").toString
    val (rawDir, aggDir) = (s"$root/raw", s"$root/agg")

    val day1 = Seq(("d1", 10L), ("d1", 20L), ("d2", 5L)).toDF("day", "v")
    day1.write.partitionBy("day").parquet(rawDir)
    // initial build
    assert(graft.load.Load.replacePartitions(
      spark, dailyTotals(spark.read.parquet(rawDir)), aggDir, "day").isSuccess)

    // late rows for d1 plus a brand-new d3 land in raw
    val delta = Seq(("d1", 100L), ("d3", 7L)).toDF("day", "v")
    delta.write.mode("append").partitionBy("day").parquet(rawDir)
    val raw = spark.read.parquet(rawDir)

    val d2Before = new java.io.File(s"$aggDir/day=d2").lastModified()
    val r = IncrementalAgg.refresh(spark, raw, delta, aggDir, "day")(dailyTotals)
    assert(r.isSuccess, s"got $r")

    // equals the full rebuild
    assertSameRows(spark.read.parquet(aggDir), dailyTotals(raw))
    // untouched partition was not rewritten
    assert(new java.io.File(s"$aggDir/day=d2").lastModified() == d2Before,
      "untouched partition must keep its original files")
  }

  test("replayed delta is idempotent; empty delta writes nothing") {
    val root = java.nio.file.Files.createTempDirectory("graft_iagg2").toString
    val (rawDir, aggDir) = (s"$root/raw", s"$root/agg")
    Seq(("d1", 1L), ("d2", 2L)).toDF("day", "v")
      .write.partitionBy("day").parquet(rawDir)
    val raw = spark.read.parquet(rawDir)
    assert(graft.load.Load.replacePartitions(
      spark, dailyTotals(raw), aggDir, "day").isSuccess)

    val delta = Seq(("d1", 1L)).toDF("day", "v") // already in raw — a replay
    assert(IncrementalAgg.refresh(spark, raw, delta, aggDir, "day")(dailyTotals).isSuccess)
    assert(IncrementalAgg.refresh(spark, raw, delta, aggDir, "day")(dailyTotals).isSuccess)
    assertSameRows(spark.read.parquet(aggDir), dailyTotals(raw))

    val empty = Seq.empty[(String, Long)].toDF("day", "v")
    val r = IncrementalAgg.refresh(spark, raw, empty, aggDir, "day")(dailyTotals)
    assert(r.isSuccess && r.get.rows == 0L)
  }

  test("a touched partition whose recomputed aggregate is EMPTY is dropped, not left stale") {
    val root = java.nio.file.Files.createTempDirectory("graft_iagg4").toString
    val (rawDir, aggDir) = (s"$root/raw", s"$root/agg")
    // agg keeps only rows with v < 100
    def smallTotals(raw: DataFrame): DataFrame =
      dailyTotals(raw.where($"v" < 100))
    Seq(("d1", 10L), ("d2", 20L)).toDF("day", "v")
      .write.partitionBy("day").parquet(rawDir)
    assert(graft.load.Load.replacePartitions(
      spark, smallTotals(spark.read.parquet(rawDir)), aggDir, "day").isSuccess)
    assert(new java.io.File(s"$aggDir/day=d1").exists())

    // late d1 row replaces nothing, but a correction marks d1's rows big:
    // simulate by appending big rows and removing nothing — recomputed
    // d1 has no sub-100 rows ONLY if we rewrite raw; emulate with a raw
    // that now fails the filter for d1
    val delta = Seq(("d1", 500L)).toDF("day", "v")
    delta.write.mode("append").partitionBy("day").parquet(rawDir)
    val rawNow = spark.read.parquet(rawDir).where(!($"day" === "d1" && $"v" === 10L))
    val r = IncrementalAgg.refresh(spark, rawNow, delta, aggDir, "day")(smallTotals)
    assert(r.isSuccess, s"got $r")
    assert(!new java.io.File(s"$aggDir/day=d1").exists(),
      "emptied aggregate partition must be dropped — stale files are the silent-divergence hole")
    assertSameRows(spark.read.parquet(aggDir), smallTotals(rawNow))
  }

  test("a partition-remapping aggregation is refused loudly") {
    val root = java.nio.file.Files.createTempDirectory("graft_iagg5").toString
    Seq(("d1", 1L), ("d2", 2L)).toDF("day", "v")
      .write.partitionBy("day").parquet(s"$root/raw")
    val raw = spark.read.parquet(s"$root/raw")
    val delta = Seq(("d1", 1L)).toDF("day", "v")
    val bad = IncrementalAgg.refresh(spark, raw, delta, s"$root/agg", "day")(
      // remaps every touched day onto a constant "week" partition value
      df => df.withColumn("day", lit("w1")).groupBy($"day").agg(sum($"v").as("total")))
    assert(bad.isFailure)
    assert(bad.failed.get.getMessage.contains("partition-local"),
      s"got: ${bad.failed.get.getMessage}")
  }

  test("aggregation dropping the partition column is refused") {
    val root = java.nio.file.Files.createTempDirectory("graft_iagg3").toString
    Seq(("d1", 1L)).toDF("day", "v").write.partitionBy("day").parquet(s"$root/raw")
    val raw = spark.read.parquet(s"$root/raw")
    val bad = IncrementalAgg.refresh(spark, raw, raw, s"$root/agg", "day")(
      df => df.agg(sum($"v").as("total")))
    assert(bad.isFailure)
    assert(bad.failed.get.getMessage.contains("preserve"))
  }
}
