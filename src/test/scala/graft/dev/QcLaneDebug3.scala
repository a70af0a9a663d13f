package graft.dev

import org.apache.spark.sql.functions._

object QcLaneDebug3 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(8)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val r = new scala.util.Random(42)
    val xs = Seq.fill(4000)(r.nextDouble() * 10 - 5)
    val df = xs.toDF("v")
    val got = df.select($"v", exp($"v").as("e")).collect()
      .map(row => row.getDouble(0) -> row.getDouble(1)).toMap
    var dMath = 0; var dStrict = 0
    xs.foreach { v =>
      if (got(v) != java.lang.Math.exp(v)) dMath += 1
      if (got(v) != java.lang.StrictMath.exp(v)) dStrict += 1
    }
    println(s"[qcdbg3] spark exp vs Math.exp diffs=$dMath vs StrictMath.exp diffs=$dStrict of ${xs.size}")
    spark.stop()
  }
}
