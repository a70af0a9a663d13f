package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.core.Tables
import graft.operators.Multimodal

/** Multimodal-column plumbing over the fixtures: documents' UTF-8 bytes
  * stand in for media payloads (no codecs in this container — the decode
  * stage is a deterministic stub; see operators.Multimodal). The
  * oracle covers the expression-level binary path (payload length,
  * content hash, frame count); the typed batched-decode path is
  * spec-verified.
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
      """))
  )
}
