package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (getOrCreate — one JVM session). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4)

  /** Order-insensitive comparison (SURVEY N8): rows as multisets. */
  def rowsOf(df: org.apache.spark.sql.DataFrame): Map[Seq[Any], Int] =
    df.collect().toSeq.map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap

  def assertSameRows(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.columns.sorted.toSeq == b.columns.sorted.toSeq, "column sets differ")
    val cols = a.columns.sorted.toIndexedSeq
    val av = rowsOf(a.select(cols.map(org.apache.spark.sql.functions.col): _*))
    val bv = rowsOf(b.select(cols.map(org.apache.spark.sql.functions.col): _*))
    assert(av == bv, s"row multisets differ: only-left=${av.toSet -- bv.toSet} only-right=${bv.toSet -- av.toSet}")
  }
}
