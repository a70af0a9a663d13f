package graft.tools

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** ScaleUp invariants: the scaled fixture must be a FAITHFUL workload
  * at N× — counts, join graph, within-copy structure — and refuse
  * inputs whose keys would collide.
  */
class ScaleUpSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val copies = 3

  test("row counts scale by copies; dims stay fixed; copy 0 is the identity") {
    val li = ScaleUp.scaleTable(spark, sf, "lineitem", copies)
    val base = spark.read.parquet(s"$sf/lineitem.parquet")
    assert(li.count() == copies * base.count())
    assert(ScaleUp.scaleTable(spark, sf, "nation", copies).count() == 25)
    // copy 0 rows are the base rows verbatim
    assertSameRows(li.where($"l_orderkey" < 1000000), base)
  }

  test("join graph preserved: no dangling lineitem->orders across any copy") {
    val li = ScaleUp.scaleTable(spark, sf, "lineitem", copies)
    val ord = ScaleUp.scaleTable(spark, sf, "orders", copies)
    val dangling = li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti").count()
    assert(dangling == 0)
    // and per-copy order counts are identical (the offset is clean)
    val perCopy = ord.groupBy(($"o_orderkey" / 1000000).cast("long").as("copy"))
      .count().as[(Long, Long)].collect().toMap
    assert(perCopy.size == copies && perCopy.values.toSet.size == 1)
  }

  test("embedding transform is orthogonal: norms and within-copy dots preserved") {
    val emb = ScaleUp.scaleTable(spark, sf, "embeddings", copies)
    val norms = emb.select((($"vec_id" / 100000).cast("long")).as("copy"),
        sqrt(aggregate(transform($"embedding", x => x.cast("double") * x),
          lit(0.0), (a, b) => a + b)).as("n"))
      .groupBy($"copy").agg(min($"n").as("lo"), max($"n").as("hi"))
      .as[(Long, Double, Double)].collect()
    assert(norms.length == copies)
    norms.foreach { case (_, lo, hi) =>
      assert(math.abs(lo - 1.0) < 1e-3 && math.abs(hi - 1.0) < 1e-3) }
    // within-copy pairwise dot of two fixed vectors matches the base
    def dotOf(df: org.apache.spark.sql.DataFrame, a: Long, b: Long): Double = {
      val va = df.where($"vec_id" === a).select($"embedding").head.getSeq[Float](0)
      val vb = df.where($"vec_id" === b).select($"embedding").head.getSeq[Float](0)
      va.zip(vb).map { case (x, y) => x.toDouble * y.toDouble }.sum
    }
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val d0 = dotOf(base, 3L, 7L)
    val d1 = dotOf(emb, 100003L, 100007L)
    assert(math.abs(d0 - d1) < 1e-9, s"copy-1 dot $d1 != base dot $d0")
  }

  test("caesar text keeps lengths and within-copy equality, breaks cross-copy shingles") {
    val docs = ScaleUp.scaleTable(spark, sf, "documents", copies)
    val joined = docs.where($"doc_id" < 100000).as("a")
      .join(docs.as("b"), col("b.doc_id") === col("a.doc_id") + 100000)
      .select(col("a.text").as("ta"), col("b.text").as("tb"))
    val bad = joined.where(length($"ta") =!= length($"tb") || $"ta" === $"tb").count()
    assert(bad == 0, "caesar must preserve length and change the text")
  }

  test("re-scaling an already-scaled fixture fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rescale").toString
    ScaleUp.scaleTable(spark, sf, "orders", copies)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val e = intercept[IllegalArgumentException] {
      ScaleUp.scaleTable(spark, dir, "orders", copies).count()
    }
    assert(e.getMessage.contains("copies would collide"))
  }
}
