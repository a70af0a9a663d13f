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

  test("binaryFile ingest: directory of media files -> typed records") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media")
    java.nio.file.Files.write(dir.resolve("a.jpg"), Array.fill[Byte](100)(1))
    java.nio.file.Files.write(dir.resolve("b.png"), Array.fill[Byte](200)(2))
    java.nio.file.Files.write(dir.resolve("skip.txt"), Array.fill[Byte](10)(3))
    val got = Multimodal.readBinaryDir(spark, dir.toString, glob = "*.{jpg,png}")
      .collect().sortBy(_.payload.length)
    assert(got.length == 2, "glob must filter at the file index")
    assert(got.map(_.format).toSet == Set("jpg", "png"))
    assert(got.map(_.payload.length).toSeq == Seq(100, 200))
    val feats = Multimodal.extractFeatures(
      Multimodal.readBinaryDir(spark, dir.toString, glob = "*.{jpg,png}")).collect()
    assert(feats.length == 2 && feats.forall(_.features.length == 8))
  }

  /** A well-formed 2×2 24-bit uncompressed BMP: red/green bottom row,
    * blue/white top row (bottom-up rows, BGR byte order, 4-byte row
    * padding).
    */
  private def bmp2x2: Array[Byte] = {
    val b = scala.collection.mutable.ArrayBuffer[Byte]()
    def le32(v: Int): Unit = b ++= Seq(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xff).toByte)
    def le16(v: Int): Unit = b ++= Seq(v, v >> 8).map(x => (x & 0xff).toByte)
    b += 'B'.toByte += 'M'.toByte
    le32(70); le32(0); le32(54) // file size, reserved, data offset
    le32(40); le32(2); le32(2) // info size, width, height (bottom-up)
    le16(1); le16(24); le32(0); le32(16) // planes, bpp, BI_RGB, image size
    le32(0); le32(0); le32(0); le32(0) // ppm + palette fields
    // bottom row: red(255,0,0) green(0,255,0) as BGR + 2 pad bytes
    b ++= Array[Byte](0, 0, 255.toByte, 0, 255.toByte, 0, 0, 0)
    // top row: blue(0,0,255) white(255,255,255) as BGR + 2 pad bytes
    b ++= Array[Byte](255.toByte, 0, 0, 255.toByte, 255.toByte, 255.toByte, 0, 0)
    b.toArray
  }

  test("real BMP decode: header dims and integer-exact pixel statistics") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bmp")
    java.nio.file.Files.write(dir.resolve("img.bmp"), bmp2x2)
    val feats = Multimodal.extractFeatures(
      Multimodal.readBinaryDir(spark, dir.toString, glob = "*.bmp")).collect()
    assert(feats.length == 1)
    val f = feats.head
    assert(f.width == 2 && f.height == 2 && f.n_bytes == 70)
    // [sumR, sumG, sumB, nPix, min(r+g+b), max(r+g+b), 0, 0]
    assert(f.features.toSeq == Seq(510f, 510f, 510f, 4f, 255f, 765f, 0f, 0f))
  }

  test("real PPM decode, and malformed real-format payloads fall to the stub lane") {
    val ppm = "P6\n2 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4, 5, 6)
    assert(Multimodal.decodePpm(ppm).map { case (w, h, f) => (w, h, f.toSeq) } ==
      Some((2, 1, Seq(5f, 7f, 9f, 2f, 6f, 15f, 0f, 0f))))
    // comments + multi-digit dims parse; truncated payload is rejected
    val hdr = "P6 # comment\n# more\n10 2\n255\n".getBytes("US-ASCII")
    assert(Multimodal.decodePpm(hdr ++ Array.fill[Byte](60)(7)).map(t => (t._1, t._2)) ==
      Some((10, 2)))
    assert(Multimodal.decodePpm(hdr ++ Array.fill[Byte](59)(7)).isEmpty)
    // a declared-bmp payload that doesn't parse still yields a row
    // (deterministic stub), keeping the pipeline total
    val out = Multimodal.extractFeatures(
      Seq(MediaRecord(9L, Array[Byte]('B', 'M', 1, 2), "bmp")).toDS()).collect()
    assert(out.length == 1 && out.head.features.length == 8)
  }

  test("hostile BMP header with overflowing width falls to the stub, not a crash") {
    // width 89478486: 24*width overflows Int to a negative rowSize, which
    // pre-fix slipped past the bounds check and crashed the pixel loop
    val b = scala.collection.mutable.ArrayBuffer[Byte]()
    def le32(v: Int): Unit = b ++= Seq(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xff).toByte)
    def le16(v: Int): Unit = b ++= Seq(v, v >> 8).map(x => (x & 0xff).toByte)
    b += 'B'.toByte += 'M'.toByte
    le32(70); le32(0); le32(54)
    le32(40); le32(89478486); le32(1) // hostile width, height 1
    le16(1); le16(24); le32(0); le32(0)
    le32(0); le32(0); le32(0); le32(0)
    b ++= Array.fill[Byte](16)(9) // a few payload bytes
    val hostile = b.toArray
    assert(Multimodal.decodeBmp(hostile).isEmpty, "must reject, not overflow")
    val out = Multimodal.extractFeatures(
      Seq(MediaRecord(1L, hostile, "bmp")).toDS()).collect()
    assert(out.length == 1 && out.head.features.length == 8, "stub lane must absorb it")
  }

  /** Minimal valid WAV: PCM header (rate, channels) + int16 LE samples. */
  private def wav(rate: Int, channels: Int, samples: Seq[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(channels.toShort)
    bb.putInt(rate); bb.putInt(rate * channels * 2)
    bb.putShort((channels * 2).toShort); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("real WAV decode: signed samples, zero crossings, chunk walk") {
    // negative samples + sign changes — the lane the all-positive
    // q103 oracle payloads never exercise
    val got = Multimodal.decodeWav(wav(8000, 1, Seq(100, -200, 300, -400, 500)))
    // [n, sum, min, max, zeroCrossings, 0, 0, 0]
    assert(got.map { case (w, h, f) => (w, h, f.toSeq) } ==
      Some((8000, 1, Seq(5f, 300f, -400f, 500f, 4f, 0f, 0f, 0f))))
    // an extra chunk BEFORE fmt/data must be skipped, not rejected
    val extra = {
      val base = wav(44100, 2, Seq(1, 2))
      val junk = "LIST".getBytes("US-ASCII") ++
        Array[Byte](4, 0, 0, 0) ++ Array.fill[Byte](4)(9)
      base.take(12) ++ junk ++ base.drop(12)
    }
    // RIFF size field is now stale, but the chunk walk bounds on the
    // actual payload length — decode must still succeed
    assert(Multimodal.decodeWav(extra).map(t => (t._1, t._2)) == Some((44100, 2)))
    // truncated data chunk, 8-bit PCM, and non-RIFF all fall to None
    assert(Multimodal.decodeWav(wav(8000, 1, Seq(1, 2, 3)).dropRight(1)).isEmpty)
    val eightBit = wav(8000, 1, Seq(1)); eightBit(34) = 8
    assert(Multimodal.decodeWav(eightBit).isEmpty)
    assert(Multimodal.decodeWav("not audio at all".getBytes).isEmpty)
  }

  test("wav dispatch: declared-wav garbage rides the stub lane; real wav decodes") {
    val out = Multimodal.extractFeatures(Seq(
        MediaRecord(1L, wav(16000, 1, Seq(7, -7)), "wav"),
        MediaRecord(2L, Array[Byte]('R', 'I', 'F', 'F', 0), "wav")).toDS())
      .collect().sortBy(_.media_id)
    assert(out.length == 2)
    assert(out(0).width == 16000 && out(0).height == 1 &&
      out(0).features.toSeq == Seq(2f, 0f, -7f, 7f, 1f, 0f, 0f, 0f))
    assert(out(1).features.length == 8, "stub lane must absorb the garbage")
  }

  private def rgbImage(w: Int, h: Int)(pixel: Int => (Int, Int, Int)) = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w * h).foreach { i =>
      val (r, g, b) = pixel(i)
      img.setRGB(i % w, i / w, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def encoded(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("real PNG decode via ImageIO: lossless round-trip, exact pixel statistics") {
    val png = encoded(rgbImage(3, 2)(i => (10 * i, 20 * i, 30 * i)), "png")
    val got = Multimodal.decodeImageIo(png)
    // sums over i=0..5: 10*15, 20*15, 30*15; luma l_i = 60*i
    assert(got.map { case (w, h, f) => (w, h, f.toSeq) } ==
      Some((3, 2, Seq(150f, 300f, 450f, 6f, 0f, 300f, 0f, 0f))))
    // dispatch arm: a png-formatted record decodes for real end-to-end
    val out = Multimodal.extractFeatures(
      Seq(MediaRecord(1L, png, "png")).toDS()).collect()
    assert(out.head.width == 3 && out.head.height == 2 &&
      out.head.features.toSeq == Seq(150f, 300f, 450f, 6f, 0f, 300f, 0f, 0f))
  }

  test("real JPEG decode via ImageIO: exact dims, near-exact solid color") {
    // a solid-color image survives JPEG's DCT nearly exactly (DC-only
    // blocks); dims and pixel count are exact, channel means are close
    val jpg = encoded(rgbImage(16, 8)(_ => (128, 64, 192)), "jpg")
    val Some((w, h, f)) = Multimodal.decodeImageIo(jpg)
    assert(w == 16 && h == 8 && f(3) == 128f)
    assert(math.abs(f(0) / 128 - 128) <= 3, s"mean R drifted: ${f(0) / 128}")
    assert(math.abs(f(1) / 128 - 64) <= 3, s"mean G drifted: ${f(1) / 128}")
    assert(math.abs(f(2) / 128 - 192) <= 3, s"mean B drifted: ${f(2) / 128}")
    // same-payload decode is deterministic (required by the bench/verify
    // contract even for the lossy codec)
    assert(Multimodal.decodeImageIo(jpg)
      .map { case (w2, h2, f2) => (w2, h2, f2.toSeq) } == Some((w, h, f.toSeq)))
    // dispatch: jpeg-formatted garbage still rides the stub lane
    val out = Multimodal.extractFeatures(Seq(
        MediaRecord(1L, jpg, "jpeg"),
        MediaRecord(2L, Array.fill[Byte](64)(7), "jpg")).toDS())
      .collect().sortBy(_.media_id)
    assert(out(0).width == 16 && out(0).height == 8)
    assert(out(1).features.length == 8, "stub lane must absorb non-jpeg bytes")
  }

  test("real TIFF decode via ImageIO plugin: lossless round-trip, exact pixel statistics, resize arm") {
    val tif = encoded(rgbImage(3, 2)(i => (10 * i, 20 * i, 30 * i)), "tiff")
    assert(Multimodal.decodeImageIo(tif).map { case (w, h, f) => (w, h, f.toSeq) } ==
      Some((3, 2, Seq(150f, 300f, 450f, 6f, 0f, 300f, 0f, 0f))))
    // both extension spellings dispatch to the real decoder
    val out = Multimodal.extractFeatures(Seq(
        MediaRecord(1L, tif, "tif"), MediaRecord(2L, tif, "tiff")).toDS())
      .collect().sortBy(_.media_id)
    out.foreach(o => assert(o.width == 3 && o.height == 2 &&
      o.features.toSeq == Seq(150f, 300f, 450f, 6f, 0f, 300f, 0f, 0f)))
    // the real-thumbnail pass covers tiff too (identity box here)
    val rz = Multimodal.resizeDecoded(Seq(MediaRecord(3L, tif, "tiff")).toDS(), 8)
      .collect().head
    assert(rz.width == 3 && rz.height == 2 &&
      rz.features.toSeq == Seq(150f, 300f, 450f, 6f, 0f, 300f, 0f, 0f))
  }

  test("dropUndecodable policy: undecodable records are dropped, not stubbed; default keeps them on the stub lane") {
    val png = encoded(rgbImage(2, 2)(_ => (9, 9, 9)), "png")
    val recs = Seq(
      MediaRecord(1L, png, "png"),
      MediaRecord(2L, Array.fill[Byte](32)(7), "webp"), // no JDK decoder
      MediaRecord(3L, Array.fill[Byte](32)(7), "png")   // malformed real format
    ).toDS()
    val kept = Multimodal.extractFeatures(recs).collect()
    assert(kept.length == 3, "default policy must keep every record (stub lane)")
    val dropped = Multimodal.extractFeatures(recs, dropUndecodable = true).collect()
    assert(dropped.map(_.media_id).toSeq == Seq(1L),
      "dropUndecodable must emit only really-decoded records")
  }

  test("hostile image header claiming huge dims is rejected BEFORE decode allocates") {
    // hand-crafted PNG: valid signature + IHDR declaring 60000×60000
    // (3.6e9 px ≈ 14 GB raster) with a correct CRC — the reader parses
    // the header, the bound rejects it, reader.read is never called
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val ihdrBody = "IHDR".getBytes("US-ASCII") ++ be32(60000) ++ be32(60000) ++
      Array[Byte](8, 2, 0, 0, 0) // depth 8, truecolor, std compression
    val crc = new java.util.zip.CRC32(); crc.update(ihdrBody)
    val bomb = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ ihdrBody ++ be32(crc.getValue.toInt)
    val t0 = System.nanoTime()
    assert(Multimodal.decodeImageIo(bomb).isEmpty, "bomb must be rejected")
    assert((System.nanoTime() - t0) / 1e9 < 5, "rejection must not have decoded anything")
    // the stub lane absorbs it end-to-end
    val out = Multimodal.extractFeatures(
      Seq(MediaRecord(1L, bomb, "png")).toDS()).collect()
    assert(out.length == 1 && out.head.features.length == 8)
    // sane images still decode through the header-checked path
    val png = encoded(rgbImage(2, 2)(_ => (1, 2, 3)), "png")
    assert(Multimodal.decodeImageIo(png).nonEmpty)
    assert(Multimodal.decodeImageIo("not an image".getBytes).isEmpty)
  }

  test("ingested records carry the unique source path beside the hashed id") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media_path")
    java.nio.file.Files.write(dir.resolve("x.bin"), Array.fill[Byte](5)(1))
    val rec = Multimodal.readBinaryDir(spark, dir.toString, glob = "*.bin").collect().head
    assert(rec.path.endsWith("x.bin"))
  }

  test("resizeDecoded: real pixel downscale — dims, count, and means of the RESIZED image") {
    // 16×8 solid color: any correct area-averaging resize preserves the
    // exact channel values; pixel count must be of the TARGET image
    val png = encoded(rgbImage(16, 8)(_ => (100, 150, 200)), "png")
    val out = Multimodal.resizeDecoded(
      Seq(MediaRecord(1L, png, "png")).toDS(), maxSide = 4).collect().head
    assert(out.width == 4 && out.height == 2, s"got ${out.width}x${out.height}")
    assert(out.features(3) == 8f, "pixel count must be the resized image's")
    assert(out.features(0) == 100f * 8 && out.features(1) == 150f * 8 &&
      out.features(2) == 200f * 8, "solid color must survive box averaging exactly")
    // gradient image: resized stats differ from source stats (proves the
    // stats are computed AFTER the resize), total brightness ~preserved
    val grad = encoded(rgbImage(8, 8)(i => (i * 4 , 0, 0)), "png")
    val full = Multimodal.extractFeatures(
      Seq(MediaRecord(2L, grad, "png")).toDS()).collect().head
    val small = Multimodal.resizeDecoded(
      Seq(MediaRecord(2L, grad, "png")).toDS(), maxSide = 4).collect().head
    assert(small.width == 4 && small.height == 4 && small.features(3) == 16f)
    val meanFull = full.features(0) / full.features(3)
    val meanSmall = small.features(0) / small.features(3)
    assert(math.abs(meanFull - meanSmall) <= 2, s"mean drifted: $meanFull vs $meanSmall")
    // small images pass through untouched; non-image formats keep the
    // dimension-contract fallback (stub features, scaled dims)
    val tiny = Multimodal.resizeDecoded(
      Seq(MediaRecord(3L, png, "png")).toDS(), maxSide = 64).collect().head
    assert(tiny.width == 16 && tiny.height == 8)
    val other = Multimodal.resizeDecoded(
      Seq(MediaRecord(4L, "some text".getBytes, "txt")).toDS(), maxSide = 4).collect().head
    assert(other.features.length == 8 && math.max(other.width, other.height) <= 4)
  }

  test("resizeFeatures preserves aspect ratio, caps the long side, and is idempotent on small media") {
    val ds = Multimodal.typedMedia(spark, Multimodal.withPayload(
      Seq((1L, "x" * 500), (2L, "y" * 300)).toDF("id", "text"), "id", "text", "bin"))
    val base = Multimodal.extractFeatures(ds).collect().map(f => f.media_id -> f).toMap
    val resized = Multimodal.resizeFeatures(ds, maxSide = 64).collect()
    resized.foreach { f =>
      val b = base(f.media_id)
      assert(math.max(f.width, f.height) <= math.max(64, math.max(b.width, b.height)))
      if (math.max(b.width, b.height) > 64) {
        assert(math.max(f.width, f.height) <= 64)
        // aspect ratio preserved within integer-floor tolerance
        assert(math.abs(f.width.toDouble / f.height - b.width.toDouble / b.height) <
          1.0, s"aspect drifted: $f vs $b")
      } else assert(f.width == b.width && f.height == b.height)
    }
  }
}
