package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Layout is pure physics: results unchanged, scan work reduced. The
  * specs assert the actual pruning through the FileScan's numOutputRows
  * metric — clustered layouts let parquet min/max statistics skip
  * files/row groups that an unclustered write forces the reader through.
  */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  /** Rows the parquet scan actually produced for `df` (post-pruning,
    * pre-any-further-operators), from the executed plan's metrics.
    */
  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    val executed = df.queryExecution.executedPlan
    val scans = executed.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect { case s: FileSourceScanExec => s }
      case s: FileSourceScanExec => Seq(s)
    }.flatten
    assert(scans.nonEmpty, "no file scan in plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("clusterBy: selective predicate scans a fraction of the rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val data = spark.range(0, 100000).select(
      (col("id") % 1000).as("user_id"), col("id").as("payload"))
    // unclustered: user_id is striped across every shard
    data.repartition(8).write.parquet(s"$dir/plain")
    Layout.clusterBy(data, 8, "user_id").write.parquet(s"$dir/clustered")
    val pred = col("user_id") === 7
    val plain = scannedRows(spark.read.parquet(s"$dir/plain").where(pred))
    val clustered = scannedRows(spark.read.parquet(s"$dir/clustered").where(pred))
    info(s"scanned: plain=$plain clustered=$clustered (true matches: 100)")
    assert(clustered < plain / 4,
      s"clustered layout must prune most shards: $clustered vs $plain")
    // physics only: same answer
    assert(spark.read.parquet(s"$dir/clustered").where(pred).count() ==
      spark.read.parquet(s"$dir/plain").where(pred).count())
  }

  test("zOrderBy: BOTH dimensions prune; single-column sort only one") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout_z").toString
    val grid = spark.range(0, 1 << 16).select(
      (col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    Layout.clusterBy(grid, 16, "x").write.parquet(s"$dir/by_x")
    Layout.zOrderBy(grid, 16, "x", "y", bits = 8).write.parquet(s"$dir/z")
    val xBox = col("x") < 32
    val yBox = col("y") < 32
    val zX = scannedRows(spark.read.parquet(s"$dir/z").where(xBox))
    val zY = scannedRows(spark.read.parquet(s"$dir/z").where(yBox))
    val sortX = scannedRows(spark.read.parquet(s"$dir/by_x").where(xBox))
    val sortY = scannedRows(spark.read.parquet(s"$dir/by_x").where(yBox))
    info(s"x-box: sort=$sortX z=$zX; y-box: sort=$sortY z=$zY (matches: 8192 each)")
    val total = 1L << 16
    // the x-sorted layout is perfect on x but scans EVERYTHING for y
    assert(sortX <= total / 4 && sortY == total)
    // the z layout prunes meaningfully on BOTH dimensions
    assert(zX <= total / 2 && zY <= total / 2,
      s"z-order must prune both dims: x=$zX y=$zY of $total")
    // and correctness is untouched
    assert(spark.read.parquet(s"$dir/z").where(xBox && yBox).count() == 32L * 32)
  }

  test("zValue interleaves bits correctly") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), bits = 4).as("z"))
      .as[Long].collect().toSeq
    // (3, 5): x bits 11 -> positions 0,2 ; y bits 101 -> positions 1,5
    // z = 1 + 4 + 2 + 32 = 39
    assert(out == Seq(0L, 1L, 2L, 3L, 39L))
  }
}
