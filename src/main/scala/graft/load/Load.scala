package graft.load

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import scala.util.{Failure, Success, Try}

/** Sink with the reference's truncate-then-load contract (SURVEY.md §2.7
  * K1-K5; reference `src/utils/database_util.py:37-57`).
  *
  * The reference wraps TRUNCATE + bulk append in one transaction and
  * ROLLBACKs on failure. A naive `SaveMode.Overwrite` to a parquet path
  * does NOT give that guarantee — Spark deletes the target before the
  * write job runs, so a mid-job failure loses the previous contents.
  * We stage into a sibling directory and swap via rename: any failure
  * before the swap leaves the destination untouched.
  */
final case class LoadReport(rows: Long, destination: String)

object Load {

  /** K2/K3: staged atomic-ish replace of a parquet destination path.
    * Returns K4's row-count report on success; K5's structured failure
    * otherwise (destination preserved).
    */
  def replaceTable(spark: SparkSession, df: DataFrame, destination: String): Try[LoadReport] = {
    val result = Try {
      val dest = new Path(destination)
      val staging = new Path(destination + "__staging")
      val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // Leftover staging from a prior failed run is simply overwritten.
      df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
      val rows = spark.read.parquet(staging.toString).count()
      // Swap: only now is the previous table touched.
      if (fs.exists(dest)) fs.delete(dest, true)
      if (!fs.rename(staging, dest))
        throw new java.io.IOException(s"rename $staging -> $dest failed")
      LoadReport(rows, destination)
    }
    result match {
      case Success(r) =>
        // K4: the reference's "Uploaded X rows to <dest>" signal.
        println(s"Uploaded ${r.rows} rows to ${r.destination}")
      case Failure(e) =>
        System.err.println(s"Load to $destination failed: ${e.getMessage}")
    }
    result
  }
}
