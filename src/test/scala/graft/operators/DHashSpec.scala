package graft.operators

import graft.SparkTestBase

/** dHash: known bits on a crafted gradient, format-independence (the
  * same pixels through the PPM parser and through ImageIO-PNG must
  * hash identically), noise robustness, and the undecodable-drop
  * contract.
  */
class DHashSpec extends SparkTestBase {
  import spark.implicits._

  // 9×8 PPM whose grayscale STRICTLY increases left-to-right: every
  // horizontal comparison is true → all 64 bits set → phash == -1L
  private def gradientPpm(): Array[Byte] = {
    val header = "P6\n9 8\n255\n".getBytes("US-ASCII")
    val body = Array.tabulate(8, 9) { (_, x) =>
      val v = (x * 20).toByte; Array(v, v, v)
    }.flatten.flatten
    header ++ body
  }

  private def hashOf(recs: (Long, Array[Byte], String)*): Map[Long, Long] =
    Multimodal.dHash64(
        recs.toSeq.toDF("media_id", "payload", "format")
          .withColumn("path", org.apache.spark.sql.functions.lit(""))
          .as[Multimodal.MediaRecord])
      .as[(Long, Long)].collect().toMap

  test("a strict left-to-right gradient sets all 64 bits") {
    val got = hashOf((1L, gradientPpm(), "ppm"))
    assert(got == Map(1L -> -1L))
  }

  test("same pixels via PPM and via PNG hash identically; noise flips few bits") {
    val w = 9; val h = 8
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val ppmBody = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 13 + y * 31) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
      val o = 3 * (y * w + x)
      ppmBody(o) = v.toByte; ppmBody(o + 1) = v.toByte; ppmBody(o + 2) = v.toByte
    }
    val png = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", png)
    val ppm = "P6\n9 8\n255\n".getBytes("US-ASCII") ++ ppmBody
    val got = hashOf((1L, ppm, "ppm"), (2L, png.toByteArray, "png"))
    assert(got(1L) == got(2L), "identical pixels must hash identically across codecs")
    // perturb one pixel strongly: at most a few bits move
    val o = 3 * (3 * w + 4)
    val noisy = ppm.clone()
    noisy(ppm.length - ppmBody.length + o) = 255.toByte
    val got2 = hashOf((3L, noisy, "ppm"))
    assert(java.lang.Long.bitCount(got2(3L) ^ got(1L)) <= 4,
      "a single-pixel change must move only neighboring comparisons")
  }

  test("undecodable payloads drop instead of hashing the stub lane") {
    val got = hashOf((1L, gradientPpm(), "ppm"), (2L, Array[Byte](1, 2, 3), "mystery"))
    assert(got.keySet == Set(1L))
  }
}
