package graft.core

import graft.SparkTestBase

class PartitioningSpec extends SparkTestBase {
  import spark.implicits._

  test("fanOut widens a non-splittable gzip scan that byte-stats would call wide") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gz").toString + "/t"
    (1 to 2000).map(i => (i, s"row $i payload"))
      .toDF("id", "text").coalesce(1)
      .write.option("compression", "gzip").option("header", "true").csv(dir)
    val target = spark.sparkContext.defaultParallelism
    // Shrink maxPartitionBytes so LISTING bytes claim many scan splits —
    // the regime where the old stats-only estimate called the scan wide
    // and no-opped, while the actual gzip scan is 1 partition.
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "64")
      val df = spark.read.option("header", "true").csv(dir)
      assert(df.inputFiles.forall(_.endsWith(".gz")), "fixture must be gzip")
      assert(df.rdd.getNumPartitions == 1, "gzip csv must be one scan partition")
      val out = Partitioning.fanOut(df)
      assert(out.rdd.getNumPartitions == target,
        "fanOut must widen a single-file non-splittable scan")
      assert(out.count() == 2000)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("fanOut still no-ops on a genuinely wide splittable scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wide").toString + "/t"
    (1 to 1000).map(i => (i, s"v$i")).toDF("id", "text")
      .repartition(8).write.parquet(dir)
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "64") // bytes say very wide
      val df = spark.read.parquet(dir)
      val out = Partitioning.fanOut(df)
      // .snappy.parquet must NOT trip the non-splittable suffix check
      assert(out eq df, "wide parquet scan must pass through untouched")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }
}
