package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.core.Tables
import graft.operators.Multimodal

/** Multimodal-column queries over the fixtures. Real decode paths are
  * oracle-checked per format family: PPM (q96) and PNG-via-ImageIO
  * (q117) for images, WAV PCM (q103) for audio; q47 covers the
  * expression-level binary path (payload length, content hash, frame
  * count). JPEG (lossy, no closed-form oracle) and the
  * unknown-format stub lane are spec-verified (MultimodalSpec).
  */
object MultimodalQueries {

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q47_multimodal_meta",
      (s, d) => {
        val media = Multimodal.withPayload(Tables.documents(s, d), "doc_id", "text", "text/plain")
        Multimodal.frameSample(media, "payload", frameBytes = 256, k = 4)
          .select(
            col("media_id"),
            octet_length(col("payload")).cast("long").as("n_bytes"),
            md5(col("payload")).as("content_md5"),
            col("n_frames"))
      },
      Some("""
        SELECT doc_id AS media_id,
          octet_length(encode(text)) AS n_bytes,
          md5(text) AS content_md5,
          CAST(4 AS BIGINT) AS n_frames
        FROM documents
      """)),

    // ---- q96: the REAL decode path, oracle-checked — each document's
    //      first 9 bytes become the RGB payload of a 3×1 binary PPM
    //      (header + raw pixels), which operators.Multimodal decodes
    //      with its pure-JVM P6 parser inside the batched mapPartitions
    //      pipeline. Features are the integer-exact pixel statistics
    //      (channel sums, pixel count, min/max r+g+b), so DuckDB
    //      replicates them from ascii() codes. Docs are restricted to a
    //      printable-ASCII 9-char prefix on BOTH sides so chars == bytes.
    GraftQuery(
      "q96_multimodal_decode",
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .where(col("text").rlike("^[ -~]{9}"))
          .select(
            col("doc_id").as("media_id"),
            concat(lit("P6\n3 1\n255\n").cast("binary"),
              substring(col("text"), 1, 9).cast("binary")).as("payload"),
            lit("ppm").as("format"),
            lit("").as("path"))
          .as[Multimodal.MediaRecord]
        Multimodal.extractFeatures(media).toDF()
          .select(
            col("media_id"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("n_bytes").cast("long").as("n_bytes"),
            element_at(col("features"), 1).cast("double").as("sum_r"),
            element_at(col("features"), 2).cast("double").as("sum_g"),
            element_at(col("features"), 3).cast("double").as("sum_b"),
            element_at(col("features"), 5).cast("double").as("min_rgb"),
            element_at(col("features"), 6).cast("double").as("max_rgb"))
      },
      Some("""
        WITH d AS (
          SELECT doc_id, substr(text, 1, 9) AS s
          FROM documents
          WHERE regexp_matches(text, '^[ -~]{9}')),
        b AS (
          SELECT doc_id,
            list_transform(generate_series(1, 9), i -> ascii(substr(s, i, 1))) AS cs
          FROM d)
        SELECT doc_id AS media_id,
          CAST(3 AS BIGINT) AS width,
          CAST(1 AS BIGINT) AS height,
          CAST(20 AS BIGINT) AS n_bytes,
          CAST(cs[1] + cs[4] + cs[7] AS DOUBLE) AS sum_r,
          CAST(cs[2] + cs[5] + cs[8] AS DOUBLE) AS sum_g,
          CAST(cs[3] + cs[6] + cs[9] AS DOUBLE) AS sum_b,
          CAST(least(cs[1]+cs[2]+cs[3], cs[4]+cs[5]+cs[6], cs[7]+cs[8]+cs[9]) AS DOUBLE) AS min_rgb,
          CAST(greatest(cs[1]+cs[2]+cs[3], cs[4]+cs[5]+cs[6], cs[7]+cs[8]+cs[9]) AS DOUBLE) AS max_rgb
        FROM b
      """)),

    // ---- q103: the REAL audio decode path, oracle-checked — each
    //      document's first 8 printable-ASCII bytes become the PCM
    //      payload (4 little-endian int16 samples) of a mono 8 kHz WAV
    //      whose 44-byte header is a constant, decoded by
    //      operators.Multimodal.decodeWav inside the same batched
    //      mapPartitions pipeline as the image formats. Features are
    //      integer-exact sample statistics, so DuckDB replicates them
    //      from ascii() codes: sample_k = lo + hi·256 (hi ≤ 126 keeps
    //      every sample positive → zero_cross is identically 0; the
    //      signed/negative path is spec-covered instead). ----
    GraftQuery(
      "q103_wav_decode",
      (s, d) => {
        import s.implicits._
        val header: Array[Byte] = {
          val bb = java.nio.ByteBuffer.allocate(44)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + 8)
          bb.put("WAVE".getBytes("US-ASCII"))
          bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
          bb.putShort(1); bb.putShort(1) // PCM, mono
          bb.putInt(8000); bb.putInt(8000 * 2) // rate, byte rate
          bb.putShort(2); bb.putShort(16) // block align, bits
          bb.put("data".getBytes("US-ASCII")); bb.putInt(8)
          bb.array()
        }
        val media = Tables.documents(s, d)
          .where(col("text").rlike("^[ -~]{8}"))
          .select(
            col("doc_id").as("media_id"),
            concat(lit(header), substring(col("text"), 1, 8).cast("binary")).as("payload"),
            lit("wav").as("format"),
            lit("").as("path"))
          .as[Multimodal.MediaRecord]
        Multimodal.extractFeatures(media).toDF()
          .select(
            col("media_id"),
            col("width").cast("long").as("sample_rate"),
            col("height").cast("long").as("channels"),
            col("n_bytes").cast("long").as("n_bytes"),
            element_at(col("features"), 1).cast("long").as("n_samples"),
            element_at(col("features"), 2).cast("long").as("sum_s"),
            element_at(col("features"), 3).cast("long").as("min_s"),
            element_at(col("features"), 4).cast("long").as("max_s"),
            element_at(col("features"), 5).cast("long").as("zero_cross"))
      },
      Some("""
        WITH d AS (
          SELECT doc_id, substr(text, 1, 8) AS s
          FROM documents
          WHERE regexp_matches(text, '^[ -~]{8}')),
        b AS (
          SELECT doc_id,
            list_transform(generate_series(1, 8), i -> ascii(substr(s, i, 1))) AS cs
          FROM d),
        sm AS (
          SELECT doc_id,
            list_transform(generate_series(1, 4), k -> cs[2*k-1] + cs[2*k] * 256) AS ss
          FROM b)
        SELECT doc_id AS media_id,
          CAST(8000 AS BIGINT) AS sample_rate,
          CAST(1 AS BIGINT) AS channels,
          CAST(52 AS BIGINT) AS n_bytes,
          CAST(4 AS BIGINT) AS n_samples,
          CAST(list_reduce(ss, (a, b) -> a + b) AS BIGINT) AS sum_s,
          CAST(list_aggregate(ss, 'min') AS BIGINT) AS min_s,
          CAST(list_aggregate(ss, 'max') AS BIGINT) AS max_s,
          CAST(0 AS BIGINT) AS zero_cross
        FROM sm
      """)),

    // ---- q117: REAL PNG decode through javax.imageio, oracle-checked.
    //      Each doc_id becomes an 8×4 PNG whose pixel (x, y) at flat
    //      index i = y·8+x is rgb((id+i)%256, (2id+i)%256, (3id+i)%256)
    //      — encoded with ImageIO.write on the executors, decoded back
    //      by Multimodal.decodeImageIo inside the same batched
    //      mapPartitions pipeline as every other format. PNG is
    //      lossless, so the integer-exact pixel statistics have a
    //      closed form DuckDB replicates from generate_series (JPEG's
    //      lossy path is spec-covered instead — MultimodalSpec). The
    //      payload byte count is encoder-dependent and deliberately NOT
    //      in the output contract. ----
    GraftQuery(
      "q117_png_decode",
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .where(col("doc_id") < 200)
          .select(col("doc_id")).as[Long]
          .map { id =>
            val w = 8; val h = 4
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var i = 0
            while (i < w * h) {
              val r = ((id + i) % 256).toInt
              val g = ((id * 2 + i) % 256).toInt
              val b = ((id * 3 + i) % 256).toInt
              img.setRGB(i % w, i / w, (r << 16) | (g << 8) | b)
              i += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            Multimodal.MediaRecord(id, bos.toByteArray, "png", "")
          }
        Multimodal.extractFeatures(media).toDF()
          .select(
            col("media_id"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            element_at(col("features"), 1).cast("long").as("sum_r"),
            element_at(col("features"), 2).cast("long").as("sum_g"),
            element_at(col("features"), 3).cast("long").as("sum_b"),
            element_at(col("features"), 4).cast("long").as("n_px"),
            element_at(col("features"), 5).cast("long").as("min_rgb"),
            element_at(col("features"), 6).cast("long").as("max_rgb"))
      },
      Some("""
        WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 200),
        ch AS (
          SELECT doc_id,
            list_transform(generate_series(0, 31), i -> (doc_id + i) % 256) AS rs,
            list_transform(generate_series(0, 31), i -> (doc_id * 2 + i) % 256) AS gs,
            list_transform(generate_series(0, 31), i -> (doc_id * 3 + i) % 256) AS bs
          FROM ids),
        l AS (
          SELECT doc_id, rs, gs, bs,
            list_transform(generate_series(1, 32), k -> rs[k] + gs[k] + bs[k]) AS ls
          FROM ch)
        SELECT doc_id AS media_id,
          CAST(8 AS BIGINT) AS width,
          CAST(4 AS BIGINT) AS height,
          CAST(list_reduce(rs, (a, b) -> a + b) AS BIGINT) AS sum_r,
          CAST(list_reduce(gs, (a, b) -> a + b) AS BIGINT) AS sum_g,
          CAST(list_reduce(bs, (a, b) -> a + b) AS BIGINT) AS sum_b,
          CAST(32 AS BIGINT) AS n_px,
          CAST(list_aggregate(ls, 'min') AS BIGINT) AS min_rgb,
          CAST(list_aggregate(ls, 'max') AS BIGINT) AS max_rgb
        FROM l
      """)),

    // ---- q159: PERCEPTUAL image dedup (dHash) over the real decode
    //      path — each eligible doc's 216-char printable prefix becomes
    //      a 9×8 binary PPM, plus a PLANTED near-duplicate (last char
    //      rotated one printable step → at most one grayscale cell
    //      moves → Hamming ≤ 1). Multimodal.dHash64 decodes and hashes
    //      for real; pairs come from dHashPairs' 9-band pigeonhole
    //      self-join — LOSSLESS for hd ≤ 8 (any qualifying pair agrees
    //      on ≥ 1 of 9 disjoint bands), so the naive all-pairs oracle
    //      is exactly equivalent while the Spark side never goes
    //      O(N²) in media count. The
    //      oracle recomputes every hash from ascii() codes and must
    //      agree on media count, pair count, planted-pair recovery, and
    //      the xor-fold of all hashes — a single differing bit anywhere
    //      flips the row. ----
    GraftQuery(
      "q159_image_phash_dedup",
      (s, d) => {
        import s.implicits._
        val base = Tables.documents(s, d)
          .where(col("text").rlike("^[ -~]{216}"))
          .select(col("doc_id"), substring(col("text"), 1, 216).as("s"))
        val perturbed = concat(substring(col("s"), 1, 215),
          chr(((ascii(substring(col("s"), 216, 1)) - 32 + 1) % 95) + 32))
        def ppm(body: org.apache.spark.sql.Column) =
          concat(lit("P6\n9 8\n255\n").cast("binary"), body.cast("binary"))
        // perturbed copies live in the NEGATED id space (-id-1): scale-
        // safe disjointness (an additive offset collides once real ids
        // reach it), and a planted pair is exactly the pair summing to
        // -1 — two originals sum >= 0, two perturbed sum <= -2
        val media = base.select(col("doc_id").as("media_id"),
            ppm(col("s")).as("payload"), lit("ppm").as("format"), lit("").as("path"))
          .unionByName(base.select((-col("doc_id") - 1L).as("media_id"),
            ppm(perturbed).as("payload"), lit("ppm").as("format"), lit("").as("path")))
          .as[Multimodal.MediaRecord]
        val ph = Multimodal.dHash64(media).localCheckpoint(true)
        val pairs = Multimodal.dHashPairs(ph, maxHamming = 8)
        val stats = ph.agg(count(lit(1)).as("n_media"),
          expr("bit_xor(phash)").as("phash_xor"))
        pairs.agg(count(lit(1)).as("n_pairs"),
            coalesce(sum(when(col("id_a") + col("id_b") === -1L, 1L).otherwise(0L)),
              lit(0L)).as("n_planted"))
          .crossJoin(broadcast(stats))
          .select(col("n_media"), col("n_pairs"), col("n_planted"), col("phash_xor"))
      },
      Some("""
        WITH d AS (SELECT doc_id, substr(text, 1, 216) AS s FROM documents
                   WHERE regexp_matches(text, '^[ -~]{216}')),
        v AS (SELECT doc_id AS media_id, s FROM d
              UNION ALL
              SELECT -doc_id - 1,
                substr(s, 1, 215) || chr(((ascii(substr(s, 216, 1)) - 32 + 1) % 95) + 32)
              FROM d),
        g AS (SELECT media_id,
                list_transform(generate_series(0, 71), k ->
                  (ascii(substr(s, 3*k + 1, 1)) + ascii(substr(s, 3*k + 2, 1))
                   + ascii(substr(s, 3*k + 3, 1))) // 3) AS gr
              FROM v),
        ph AS (SELECT media_id,
                -- bit 63 contributes its two's-complement value: DuckDB
                -- range-checks 1<<63, but summing -2^63 for the sign bit
                -- reproduces the same signed 64-bit word Spark packs
                list_reduce(list_transform(generate_series(0, 63), i ->
                  CASE WHEN gr[(i // 8) * 9 + (i % 8) + 1] < gr[(i // 8) * 9 + (i % 8) + 2]
                       THEN (CASE WHEN i = 63 THEN -9223372036854775807 - 1
                             ELSE (CAST(1 AS BIGINT) << i) END)
                       ELSE CAST(0 AS BIGINT) END),
                  (a, b) -> a + b) AS phash
               FROM g),
        prs AS (SELECT a.media_id AS id_a, b.media_id AS id_b
                FROM ph a JOIN ph b ON a.media_id < b.media_id
                WHERE bit_count(xor(a.phash, b.phash)) <= 8)
        SELECT CAST((SELECT count(*) FROM ph) AS BIGINT) AS n_media,
          CAST(count(*) AS BIGINT) AS n_pairs,
          CAST(coalesce(sum(CASE WHEN id_a + id_b = -1 THEN 1 ELSE 0 END), 0) AS BIGINT)
            AS n_planted,
          (SELECT bit_xor(phash) FROM ph) AS phash_xor
        FROM prs
      """))
  )
}
