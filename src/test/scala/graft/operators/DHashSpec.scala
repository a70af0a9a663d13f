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

  test("dHashPairs banding is lossless: identical to the all-pairs scan") {
    // 40 base hashes; each spawns a near-dup with k ≤ 10 flipped bits
    // (some beyond the hd≤8 cut, so the filter is exercised both ways)
    // plus 120 unrelated random hashes (expected hd ≈ 32, no pairs)
    val rnd = new scala.util.Random(42)
    val bases = Seq.tabulate(40)(i => (i.toLong, rnd.nextLong()))
    val dups = bases.map { case (id, h) =>
      val k = rnd.nextInt(11)
      val flipped = Iterator.continually(rnd.nextInt(64)).distinct.take(k)
        .foldLeft(h)((acc, b) => acc ^ (1L << b))
      (id + 1000L, flipped)
    }
    val noise = Seq.tabulate(120)(i => (5000L + i, rnd.nextLong()))
    val all = bases ++ dups ++ noise
    val got = Multimodal.dHashPairs(all.toDF("media_id", "phash"), maxHamming = 8,
        bruteMax = 0L)
      .as[(Long, Long, Int)].collect().toSet
    val want = (for {
      (ia, ha) <- all; (ib, hb) <- all if ia < ib
      hd = java.lang.Long.bitCount(ha ^ hb) if hd <= 8
    } yield (ia, ib, hd)).toSet
    assert(want.nonEmpty, "fixture must contain qualifying pairs")
    assert(want.exists(_._3 > 0), "fixture must contain non-identical qualifying pairs")
    assert(got == want)
  }

  test("dHashPairs is lossless across the radius regimes (probe and exact banding)") {
    // maxHamming 0-2 use exact bands (probe radius 0); 3+ use the
    // two-level wide-band scheme with symmetric 1-bit probes — each
    // must reproduce the all-pairs scan exactly, including radii that
    // don't divide evenly into the band arithmetic
    val rnd = new scala.util.Random(7)
    val bases = Seq.tabulate(30)(i => (i.toLong, rnd.nextLong()))
    val dups = bases.map { case (id, h) =>
      val k = rnd.nextInt(13)
      val flipped = Iterator.continually(rnd.nextInt(64)).distinct.take(k)
        .foldLeft(h)((acc, b) => acc ^ (1L << b))
      (id + 1000L, flipped)
    }
    val all = bases ++ dups ++ Seq.tabulate(60)(i => (5000L + i, rnd.nextLong()))
    val df = all.toDF("media_id", "phash")
    for (mh <- Seq(1, 2, 3, 5, 8, 11)) {
      val want = (for {
        (ia, ha) <- all; (ib, hb) <- all if ia < ib
        hd = java.lang.Long.bitCount(ha ^ hb) if hd <= mh
      } yield (ia, ib, hd)).toSet
      // bruteMax = 0 forces the banded probe join; the default gate
      // routes this fixture through the broadcast brute kernel — the
      // two paths and the reference scan must agree exactly
      val banded = Multimodal.dHashPairs(df, maxHamming = mh, bruteMax = 0L)
        .as[(Long, Long, Int)].collect().toSet
      val brute = Multimodal.dHashPairs(df, maxHamming = mh)
        .as[(Long, Long, Int)].collect().toSet
      assert(banded == want, s"maxHamming=$mh: banded join diverged from all-pairs")
      assert(brute == want, s"maxHamming=$mh: brute kernel diverged from all-pairs")
    }
  }

  test("dHashPairs plan has no cartesian join") {
    val hashed = Seq((1L, 7L), (2L, 7L), (3L, -1L)).toDF("media_id", "phash")
    val pairs = Multimodal.dHashPairs(hashed, maxHamming = 8, bruteMax = 0L)
    assert(!graft.plans.PlanLint.lint(pairs).exists(_.kind == "cartesian-join"))
    assert(pairs.as[(Long, Long, Int)].collect().toSet == Set((1L, 2L, 0)))
  }

  test("dHashPairs maxHamming=0 degenerates to an exact-equality join") {
    val hashed = Seq((1L, 42L), (2L, 42L), (3L, 43L)).toDF("media_id", "phash")
    val got = Multimodal.dHashPairs(hashed, maxHamming = 0, bruteMax = 0L)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 0)))
  }
}
