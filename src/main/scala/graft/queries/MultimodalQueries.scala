package graft.queries

import graft.Tables.t
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column coverage (north-star scope): binary payload metadata
  * and frame-sample explosion. Payloads are derived deterministically from
  * `documents.text` (this container ships no real media, so the bytes are
  * the UTF-8 text — the binary plumbing is identical). */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  private def media(s: SparkSession, dir: String): DataFrame =
    Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text",
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video"))

  val queries: Map[String, Q] = Map(
    // M1: metadata-only pass over binary payloads (length + checksum).
    "q_m1_binary_meta" -> { (s, dir) =>
      media(s, dir).select(col("doc_id"), col("media_type"),
        col("meta.byte_len").as("byte_len"),
        col("meta.checksum").as("checksum"))
        .orderBy(col("doc_id"))
    },

    // M2: deterministic frame sampling for video payloads.
    "q_m2_frame_samples" -> { (s, dir) =>
      Multimodal.frameSamples(media(s, dir), "doc_id",
        frameStride = 100L, maxFrames = 4)
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // M3: REAL image decode round-trip. Each doc gets a solid-color PNG
    // whose size/color derive arithmetically from doc_id; Spark encodes it
    // (JDK ImageIO) and decodes it back through decodeImageFeatures, so the
    // decoded width/height/means must equal the oracle's pure-SQL
    // arithmetic — a hash-checked proof the decoder is exact.
    "q_m3_image_decode" -> { (s, dir) =>
      val png = udf((w: Int, h: Int, r: Int, g: Int, b: Int) =>
        Multimodal.solidPng(w, h, r, g, b))
      val payloads = t(s, dir, "documents").select(
        col("doc_id"),
        png(
          (col("doc_id") % 7 + 1).cast("int"),
          (col("doc_id") % 5 + 1).cast("int"),
          (col("doc_id") % 256).cast("int"),
          (col("doc_id") * 7 % 256).cast("int"),
          (col("doc_id") * 13 % 256).cast("int")).as("content"))
      Multimodal.decodeImageFeatures(payloads, "doc_id")
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          element_at(col("channel_means"), 1).as("mean_r"),
          element_at(col("channel_means"), 2).as("mean_g"),
          element_at(col("channel_means"), 3).as("mean_b"))
        .orderBy(col("doc_id"))
    })

  val oracles: Map[String, String] = Map(
    "q_m1_binary_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |    WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
        |  md5(text) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_m2_frame_samples" ->
      """WITH v AS (
        |  SELECT doc_id,
        |    least(CAST(floor(octet_length(CAST(text AS BLOB)) / 100.0) AS BIGINT),
        |      4) AS n
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |  CAST(i * 100 AS BIGINT) AS byte_offset
        |FROM (SELECT doc_id, n, unnest(range(0, n)) AS i FROM v WHERE n > 0)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // Ground truth for the decode round-trip is pure arithmetic: solid
    // color (r,g,b) over w×h pixels means every channel mean IS the
    // channel value, exactly (integer-valued doubles on both engines).
    "q_m3_image_decode" ->
      """SELECT doc_id,
        |  CAST(doc_id % 7 + 1 AS INT) AS width,
        |  CAST(doc_id % 5 + 1 AS INT) AS height,
        |  3 AS channels,
        |  CAST(doc_id % 256 AS DOUBLE) AS mean_r,
        |  CAST(doc_id * 7 % 256 AS DOUBLE) AS mean_g,
        |  CAST(doc_id * 13 % 256 AS DOUBLE) AS mean_b
        |FROM documents ORDER BY doc_id""".stripMargin)
}
