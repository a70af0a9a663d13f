package graft.demo

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev probe: where does q159's time go at a given SF? Times the media
  * synthesis + dHash64 decode stage and the banded pair join stage
  * separately. Usage: Test/runMain graft.demo.DHashProfile <sfDir>
  */
object DHashProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions
      .configure(SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = graft.core.Tables.documents(spark, sfDir)
      .where(col("text").rlike("^[ -~]{216}"))
      .select(col("doc_id"), substring(col("text"), 1, 216).as("s"))
    val perturbed = concat(substring(col("s"), 1, 215),
      chr(((ascii(substring(col("s"), 216, 1)) - 32 + 1) % 95) + 32))
    def ppm(body: org.apache.spark.sql.Column) =
      concat(lit("P6\n9 8\n255\n").cast("binary"), body.cast("binary"))
    val media = base.select(col("doc_id").as("media_id"),
        ppm(col("s")).as("payload"), lit("ppm").as("format"), lit("").as("path"))
      .unionByName(base.select((-col("doc_id") - 1L).as("media_id"),
        ppm(perturbed).as("payload"), lit("ppm").as("format"), lit("").as("path")))
      .as[graft.operators.Multimodal.MediaRecord]
    var t0 = System.nanoTime()
    val ph = graft.operators.Multimodal.dHash64(media).localCheckpoint(true)
    val nMedia = ph.count()
    println(f"[profile] hash stage: ${(System.nanoTime() - t0) / 1e9}%.2f s, n_media=$nMedia")
    t0 = System.nanoTime()
    val pairs = graft.operators.Multimodal.dHashPairs(ph, maxHamming = 8)
    val nPairs = pairs.count()
    println(f"[profile] pair stage: ${(System.nanoTime() - t0) / 1e9}%.2f s, n_pairs=$nPairs")

    // sub-stage forensics: rebuild the banded table by hand (same
    // arithmetic as dHashPairs at maxHamming=8) and count raw join rows
    val widths = Seq(22, 21, 21)
    val offsets = widths.scanLeft(0)(_ + _)
    def mask(w: Int): Long = (1L << w) - 1
    val probes = (0 until 3).flatMap { b =>
      (b, 0L, -1) +: (0 until widths(b)).map(i => (b, 1L << i, i))
    }
    t0 = System.nanoTime()
    val banded = ph.select(col("media_id"), col("phash"),
        explode(array(probes.map { case (b, m, f) =>
          struct(lit(b).as("band"),
            shiftright(col("phash"), offsets(b))
              .bitwiseAND(lit(mask(widths(b)))).bitwiseXOR(lit(m)).as("bsig"),
            lit(f).as("flip"))
        }: _*)).as("bs"))
      .select(col("media_id"), col("phash"), col("bs.band"), col("bs.bsig"), col("bs.flip"))
      .localCheckpoint()
    println(f"[profile] banded build: ${(System.nanoTime() - t0) / 1e9}%.2f s, rows=${banded.count()}")
    t0 = System.nanoTime()
    val raw = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig") &&
          col("x.media_id") < col("y.media_id") &&
          (col("x.flip") === -1 || (col("y.flip") >= 0 && col("x.flip") < col("y.flip"))))
      .count()
    println(f"[profile] raw join rows: $raw in ${(System.nanoTime() - t0) / 1e9}%.2f s")

    // old 9-band exact plan, raw candidates
    val w9 = Seq.tabulate(9)(b => if (b < 64 % 9) 8 else 7)
    val o9 = w9.scanLeft(0)(_ + _)
    t0 = System.nanoTime()
    val banded9 = ph.select(col("media_id"), col("phash"),
        explode(array((0 until 9).map { b =>
          struct(lit(b).as("band"),
            shiftright(col("phash"), o9(b))
              .bitwiseAND(lit((1L << w9(b)) - 1)).as("bsig"))
        }: _*)).as("bs"))
      .select(col("media_id"), col("phash"), col("bs.band"), col("bs.bsig"))
      .localCheckpoint()
    val raw9 = banded9.as("x").join(banded9.as("y"),
        col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig") &&
          col("x.media_id") < col("y.media_id")).count()
    println(f"[profile] OLD 9-band raw join rows: $raw9 in ${(System.nanoTime() - t0) / 1e9}%.2f s")

    // broadcast brute-force floor + hd histogram (driver collects the
    // (id, hash) array — 16 B/row — and every partition scans its slice
    // against the whole array)
    t0 = System.nanoTime()
    val arr = ph.select(col("media_id"), col("phash")).as[(Long, Long)].collect().sortBy(_._1)
    val ids = arr.map(_._1); val hs = arr.map(_._2)
    val bIds = spark.sparkContext.broadcast(ids); val bHs = spark.sparkContext.broadcast(hs)
    val hist = spark.sparkContext.parallelize(0 until arr.length, 64).mapPartitions { it =>
      val ids = bIds.value; val hs = bHs.value
      val counts = new Array[Long](65)
      var pairs8 = 0L
      it.foreach { i =>
        val hi = hs(i)
        var j = i + 1
        while (j < hs.length) {
          val hd = java.lang.Long.bitCount(hi ^ hs(j))
          if (hd <= 24) counts(hd) += 1
          if (hd <= 8) pairs8 += 1
          j += 1
        }
      }
      Iterator((counts, pairs8))
    }.reduce { (a, b) => (Array.tabulate(65)(i => a._1(i) + b._1(i)), a._2 + b._2) }
    println(f"[profile] brute force: ${(System.nanoTime() - t0) / 1e9}%.2f s, pairs<=8=${hist._2}")
    println("[profile] hd histogram 0..24: " + hist._1.take(25).mkString(","))
    spark.stop()
  }
}
