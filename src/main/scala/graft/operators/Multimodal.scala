package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, batched decode/feature-extraction, and frame
  * sampling.
  *
  * The decode step is a clearly-marked DETERMINISTIC STUB (no
  * image/audio codecs exist in this container); everything around it —
  * the schema, the `mapPartitions` batching shape (the Scala analogue of
  * a Pandas `mapInPandas` batch UDF: decode cost amortized over
  * `BatchSize` records, never one-row-at-a-time), and the binary slicing
  * — is real, typed, and tested. Swapping `decodeStub` for a JNI/codec
  * call changes no plumbing.
  */
object Multimodal {

  /** Rows entering the media pipeline. */
  final case class MediaRecord(media_id: Long, payload: Array[Byte], format: String)

  /** Typed decode output. */
  final case class MediaFeatures(
      media_id: Long, width: Int, height: Int, n_bytes: Int, features: Array[Float])

  /** Batch size for the batched-decode shape (mirrors a vectorized UDF's
    * arrow batch). */
  val BatchSize = 64

  /** STUB decoder — ??? in spirit: a real implementation would call an
    * image/audio library here. This fake derives deterministic pseudo
    * metadata + an 8-dim feature vector from the bytes so the plumbing
    * is testable end-to-end.
    */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    var h = 1125899906842597L // rolling byte hash
    var i = 0
    while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
    val width = 16 + math.floorMod(h, 1024).toInt
    val height = 16 + math.floorMod(h >> 10, 1024).toInt
    val feats = Array.tabulate(8)(k => math.floorMod(h >> (8 * (k % 8)), 251).toFloat / 251f)
    (width, height, feats)
  }

  /** Batched decode: partitions stream through in `BatchSize` groups —
    * the shape a vectorized codec wants — with no driver collect and no
    * shuffle (narrow transformation; partitioning is preserved).
    */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // batch-level setup would init the codec once per batch here
        batch.iterator.map { r =>
          val (w, h, f) = decodeStub(r.payload)
          MediaFeatures(r.media_id, w, h, r.payload.length, f)
        }
      }
    }
  }

  /** Wrap any table with a binary payload column (UTF-8 bytes of a text
    * column stand in for media bytes in the fixtures).
    */
  def withPayload(df: DataFrame, idCol: String, textCol: String, format: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(textCol).cast("binary").as("payload"),
      lit(format).as("format"))

  /** Frame sampling: k fixed-stride byte windows of the payload
    * (expression-level binary slicing — at scale this is the "sample k
    * frames per video" pattern without decoding the rest).
    */
  def frameSample(df: DataFrame, payloadCol: String, frameBytes: Int, k: Int): DataFrame = {
    val n = octet_length(col(payloadCol))
    val stride = greatest((n / k).cast("int"), lit(1))
    val frames = transform(
      sequence(lit(0), lit(k - 1)),
      i => substr(col(payloadCol), i * stride + 1, lit(frameBytes)))
    df.withColumn("frames", frames)
      .withColumn("n_frames", size(col("frames")).cast("long"))
  }

  def typedMedia(spark: SparkSession, df: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    df.as[MediaRecord]
  }

  /** Media-file ingest via Spark's built-in `binaryFile` source: one row
    * per file with (path, modificationTime, length, content). The glob
    * and a `pathGlobFilter` push into the file index (no post-read
    * filter), and media ids are derived from the stable file path — the
    * real "directory of images/videos → binary column" entry point.
    */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*"): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        col("content").as("payload"),
        // lowercased so photo.JPG and photo.jpg dispatch as one media
        // type; extensionless files get an explicit sentinel, not ""
        when(col("path").rlike("\\.[A-Za-z0-9]+$"),
          lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)))
          .otherwise("unknown").as("format"))
      .as[MediaRecord]
  }

  /** Resize plumbing: recompute target dimensions preserving aspect
    * ratio (exact integer math). ONLY the dimension contract is real —
    * `features` and `n_bytes` still describe the SOURCE payload, because
    * producing resized pixels is the decode stub's job; a real codec
    * implementation would decode-resize-re-extract inside the same
    * batched pass (and this signature doesn't need to change for that).
    */
  def resizeFeatures(ds: Dataset[MediaRecord], maxSide: Int): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    require(maxSide > 0, s"maxSide must be positive, got $maxSide")
    extractFeatures(ds).map { f =>
      val long = math.max(f.width, f.height)
      if (long <= maxSide) f
      else {
        // floor-scaled dims, min 1 — the standard thumbnailing contract
        val w = math.max(1, f.width * maxSide / long)
        val h = math.max(1, f.height * maxSide / long)
        f.copy(width = w, height = h)
      }
    }
  }
}
