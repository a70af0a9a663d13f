package graft.operators

import graft.SparkTestBase
import graft.operators.Multimodal.{MediaRecord, MediaFeatures}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def media = Seq(
    MediaRecord(1L, "hello world payload".getBytes("UTF-8"), "text/plain"),
    MediaRecord(2L, Array.tabulate(1000)(i => (i % 251).toByte), "image/fake"),
    MediaRecord(3L, Array.emptyByteArray, "empty")
  ).toDS()

  test("batched decode is deterministic and partition-invariant") {
    val a = Multimodal.extractFeatures(media.repartition(1)).collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(media.repartition(4)).collect().sortBy(_.media_id)
    assert(a.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(a.zip(b).forall { case (x, y) =>
      x.width == y.width && x.height == y.height &&
        x.n_bytes == y.n_bytes && x.features.toSeq == y.features.toSeq
    })
    assert(a.forall(f => f.features.length == 8 && f.features.forall(v => v >= 0f && v <= 1f)))
    assert(a.find(_.media_id == 2L).get.n_bytes == 1000)
  }

  test("batch shape: groups of BatchSize flow through mapPartitions") {
    val big = (1L to 200L).map(i => MediaRecord(i, s"payload $i".getBytes, "t")).toDS()
      .repartition(1)
    // 200 records in one partition → decode still covers every record
    val out = Multimodal.extractFeatures(big).collect()
    assert(out.length == 200 && out.map(_.media_id).distinct.length == 200)
  }

  test("frameSample slices k byte windows via expressions") {
    val df = Multimodal.withPayload(
      Seq((1L, "a" * 1024)).toDF("id", "text"), "id", "text", "text/plain")
    val out = Multimodal.frameSample(df, "payload", frameBytes = 256, k = 4)
    val row = out.select($"n_frames", $"frames").head()
    assert(row.getLong(0) == 4L)
    val frames = row.getSeq[Array[Byte]](1)
    assert(frames.forall(_.length == 256))
  }
}
