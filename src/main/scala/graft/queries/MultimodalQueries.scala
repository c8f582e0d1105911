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

  val queries: Map[String, Q] = queriesDHash ++ Map(
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

  private def patternPng = udf((seed: Long) =>
    Multimodal.grayPatternPng(9, 8, seed))

  private def patternPng16 = udf((seed: Long) =>
    Multimodal.grayPatternPng(16, 16, seed))

  private lazy val queriesDHash: Map[String, Q] = Map(
    // M4: perceptual dHash round-trip — 9×8 arithmetic-pattern PNGs
    // (Multimodal.patternValue arithmetic) are encoded, decoded through
    // real ImageIO and gradient-hashed; the oracle computes the same
    // bits in pure SQL.
    "q_m4_image_dhash" -> { (s, dir) =>
      val payloads = t(s, dir, "documents").select(col("doc_id"),
        patternPng(col("doc_id")).as("content"))
      Multimodal.dHash(payloads, "doc_id").orderBy(col("doc_id"))
    },

    // M9: spectral (Walsh-Hadamard) perceptual hash round-trip — 16x16
    // arithmetic-pattern PNGs decode to exact integer WHT coefficients;
    // bits threshold on the exact integer median of the 63 non-DC.
    "q_m9_image_spectral_hash" -> { (s, dir) =>
      val payloads = t(s, dir, "documents").select(col("doc_id"),
        patternPng16(col("doc_id")).as("content"))
      Multimodal.spectralHash(payloads, "doc_id").orderBy(col("doc_id"))
    },

    // M10: spectral near-dup pairs — every 5th doc's image duplicated
    // under doc_id+100000 (same seed), found at Hamming 0 by the same
    // 16-bit banding join as M5.
    "q_m10_spectral_neardup" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val corpus = docs.select(col("doc_id"))
        .unionByName(docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 100000).as("doc_id")))
      val payloads = corpus.select(col("doc_id"),
        patternPng16(col("doc_id") % 100000).as("content"))
      Multimodal.spectralHashNearDuplicates(payloads, "doc_id")
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // M5: image near-dup pairs — every 5th doc's image is duplicated
    // under doc_id+100000 (same pattern seed), found at Hamming 0 by the
    // 16-bit banding join.
    "q_m5_image_neardup" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val corpus = docs.select(col("doc_id"))
        .unionByName(docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 100000).as("doc_id")))
      val payloads = corpus.select(col("doc_id"),
        patternPng(col("doc_id") % 100000).as("content"))
      Multimodal.dHashNearDuplicates(payloads, "doc_id")
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // M7: audio energy-hash round-trip — seed-modulated PCM encoded and
    // decoded through javax.sound.sampled, window energies summed in
    // Long, gradient bits vs the oracle's pure integer arithmetic.
    "q_m7_audio_fingerprint" -> { (s, dir) =>
      val wav = udf((seed: Long) => Multimodal.modulatedWav(seed, 650))
      val payloads = t(s, dir, "documents").select(col("doc_id"),
        wav(col("doc_id")).as("content"))
      Multimodal.audioEnergyHash(payloads, "doc_id").orderBy(col("doc_id"))
    },

    // M8: audio near-dup pairs — every 5th doc's audio duplicated under
    // doc_id+100000 (same seed), found at Hamming 0 by the shared
    // 16-bit banding join.
    "q_m8_audio_neardup" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val corpus = docs.select(col("doc_id"))
        .unionByName(docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 100000).as("doc_id")))
      val wav = udf((seed: Long) => Multimodal.modulatedWav(seed, 650))
      val payloads = corpus.select(col("doc_id"),
        wav(col("doc_id") % 100000).as("content"))
      Multimodal.audioNearDuplicates(payloads, "doc_id")
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // M6: REAL WAV decode round-trip — deterministic 16-bit PCM encoded
    // and decoded through javax.sound.sampled; amplitude stats must equal
    // the oracle's pure integer arithmetic.
    "q_m6_wav_decode" -> { (s, dir) =>
      val wav = udf((seed: Long, n: Int) => Multimodal.pcmWav(seed, n))
      val payloads = t(s, dir, "documents").select(col("doc_id"),
        wav(col("doc_id"), (lit(100) + col("doc_id") % 50).cast("int"))
          .as("content"))
      Multimodal.decodeWavFeatures(payloads, "doc_id")
        .select(col("doc_id"), col("sample_rate"), col("channels"),
          col("n_frames"), graft.functions.q6(col("mean_amp"))
            .as("mean_amp"),
          graft.functions.q6(col("rms")).as("rms"))
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
    // dHash ground truth: on a 9×8 image the resize is the identity, so
    // bit (8y + x) is patternValue(seed, x+1, y) > patternValue(seed, x, y)
    // — pure integer arithmetic, the same formula inlined.
    "q_m4_image_dhash" ->
      """WITH bits AS (
        |  SELECT doc_id, yy.y * 8 + xx.x AS b,
        |    CASE WHEN ((doc_id * 2654435761) % 256 + ((doc_id % 251) + 1) * (xx.x + 1) * (xx.x + 1)
        |       + (xx.x + 1) * 119 + yy.y * yy.y * 17 + yy.y * ((doc_id % 67) + 29)) % 256 >
        |      ((doc_id * 2654435761) % 256 + ((doc_id % 251) + 1) * xx.x * xx.x
        |       + xx.x * 119 + yy.y * yy.y * 17 + yy.y * ((doc_id % 67) + 29)) % 256
        |      THEN 1 ELSE 0 END AS bit
        |  FROM documents, range(8) AS xx(x), range(8) AS yy(y))
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN b >= 32
        |    THEN CAST(pow(2, b - 32) AS BIGINT) * bit ELSE 0 END)
        |    AS BIGINT) AS hi,
        |  CAST(sum(CASE WHEN b < 32
        |    THEN CAST(pow(2, b) AS BIGINT) * bit ELSE 0 END)
        |    AS BIGINT) AS lo
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Image near-dup: same bits over the planted corpus (copies share
    // the seed), 4×16-bit bands, in-join Hamming verify — the q_x21
    // band structure over dHash values.
    // M9 ground truth: the 16x16 pattern pixels ARE the grid cells; WHT
    // signs from explicit 3-bit parity arithmetic, exact integer sums,
    // the 32nd-smallest non-DC coefficient as the threshold.
    "q_m9_image_spectral_hash" ->
      """WITH g AS (
        |  SELECT doc_id, xx.x AS x, yy.y AS y,
        |    ((doc_id * 2654435761) % 256
        |      + ((doc_id % 251) + 1) * xx.x * xx.x + xx.x * 119
        |      + yy.y * yy.y * 17 + yy.y * ((doc_id % 67) + 29)) % 256
        |      AS gv
        |  FROM documents, range(16) AS xx(x), range(16) AS yy(y)),
        |co AS (
        |  SELECT doc_id, vv.v * 8 + uu.u AS b,
        |    CAST(sum(CASE WHEN (
        |        ((x & uu.u) & 1) + (((x & uu.u) >> 1) & 1)
        |          + (((x & uu.u) >> 2) & 1)
        |        + ((y & vv.v) & 1) + (((y & vv.v) >> 1) & 1)
        |          + (((y & vv.v) >> 2) & 1)) % 2 = 1
        |      THEN -gv ELSE gv END) AS BIGINT) AS w
        |  FROM g, range(8) AS uu(u), range(8) AS vv(v)
        |  GROUP BY doc_id, vv.v * 8 + uu.u),
        |med AS (
        |  SELECT doc_id, w AS med FROM (
        |    SELECT doc_id, w,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY w) AS rn
        |    FROM co WHERE b <> 0) WHERE rn = 32),
        |bits AS (
        |  SELECT co.doc_id, b,
        |    CASE WHEN w > med THEN 1 ELSE 0 END AS bit
        |  FROM co JOIN med ON med.doc_id = co.doc_id)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN b >= 32
        |    THEN CAST(pow(2, b - 32) AS BIGINT) * bit ELSE 0 END)
        |    AS BIGINT) AS hi,
        |  CAST(sum(CASE WHEN b < 32
        |    THEN CAST(pow(2, b) AS BIGINT) * bit ELSE 0 END)
        |    AS BIGINT) AS lo
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // M10: the same spectral bits over the planted corpus, the q_m5
    // band structure and in-join Hamming verify.
    "q_m10_spectral_neardup" ->
      """WITH corpus AS (
        |  SELECT doc_id, doc_id AS seed FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, doc_id AS seed
        |  FROM documents WHERE doc_id % 5 = 0),
        |g AS (
        |  SELECT doc_id, xx.x AS x, yy.y AS y,
        |    ((seed * 2654435761) % 256
        |      + ((seed % 251) + 1) * xx.x * xx.x + xx.x * 119
        |      + yy.y * yy.y * 17 + yy.y * ((seed % 67) + 29)) % 256
        |      AS gv
        |  FROM corpus, range(16) AS xx(x), range(16) AS yy(y)),
        |co AS (
        |  SELECT doc_id, vv.v * 8 + uu.u AS b,
        |    CAST(sum(CASE WHEN (
        |        ((x & uu.u) & 1) + (((x & uu.u) >> 1) & 1)
        |          + (((x & uu.u) >> 2) & 1)
        |        + ((y & vv.v) & 1) + (((y & vv.v) >> 1) & 1)
        |          + (((y & vv.v) >> 2) & 1)) % 2 = 1
        |      THEN -gv ELSE gv END) AS BIGINT) AS w
        |  FROM g, range(8) AS uu(u), range(8) AS vv(v)
        |  GROUP BY doc_id, vv.v * 8 + uu.u),
        |med AS (
        |  SELECT doc_id, w AS med FROM (
        |    SELECT doc_id, w,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY w) AS rn
        |    FROM co WHERE b <> 0) WHERE rn = 32),
        |bits AS (
        |  SELECT co.doc_id, b,
        |    CASE WHEN w > med THEN 1 ELSE 0 END AS bit
        |  FROM co JOIN med ON med.doc_id = co.doc_id),
        |sim AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN b >= 32
        |      THEN CAST(pow(2, b - 32) AS BIGINT) * bit ELSE 0 END)
        |      AS BIGINT) AS hi,
        |    CAST(sum(CASE WHEN b < 32
        |      THEN CAST(pow(2, b) AS BIGINT) * bit ELSE 0 END)
        |      AS BIGINT) AS lo
        |  FROM bits GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, b,
        |    CASE b WHEN 0 THEN lo % 65536
        |           WHEN 1 THEN CAST(floor(lo / 65536) AS BIGINT)
        |           WHEN 2 THEN hi % 65536
        |           ELSE CAST(floor(hi / 65536) AS BIGINT) END AS bv
        |  FROM sim, range(4) AS r(b)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
        |  FROM bands a JOIN bands c
        |    ON a.b = c.b AND a.bv = c.bv AND a.doc_id < c.doc_id)
        |SELECT doc_a, doc_b,
        |  CAST(bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo))
        |    AS BIGINT) AS hamming
        |FROM cand
        |JOIN sim x ON x.doc_id = doc_a
        |JOIN sim y ON y.doc_id = doc_b
        |WHERE bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_m5_image_neardup" ->
      """WITH corpus AS (
        |  SELECT doc_id, doc_id AS seed FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, doc_id AS seed
        |  FROM documents WHERE doc_id % 5 = 0),
        |bits AS (
        |  SELECT doc_id, yy.y * 8 + xx.x AS b,
        |    CASE WHEN ((seed * 2654435761) % 256 + ((seed % 251) + 1) * (xx.x + 1) * (xx.x + 1)
        |       + (xx.x + 1) * 119 + yy.y * yy.y * 17 + yy.y * ((seed % 67) + 29)) % 256 >
        |      ((seed * 2654435761) % 256 + ((seed % 251) + 1) * xx.x * xx.x
        |       + xx.x * 119 + yy.y * yy.y * 17 + yy.y * ((seed % 67) + 29)) % 256
        |      THEN 1 ELSE 0 END AS bit
        |  FROM corpus, range(8) AS xx(x), range(8) AS yy(y)),
        |sim AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN b >= 32
        |      THEN CAST(pow(2, b - 32) AS BIGINT) * bit ELSE 0 END)
        |      AS BIGINT) AS hi,
        |    CAST(sum(CASE WHEN b < 32
        |      THEN CAST(pow(2, b) AS BIGINT) * bit ELSE 0 END)
        |      AS BIGINT) AS lo
        |  FROM bits GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, b,
        |    CASE b WHEN 0 THEN lo % 65536
        |           WHEN 1 THEN CAST(floor(lo / 65536) AS BIGINT)
        |           WHEN 2 THEN hi % 65536
        |           ELSE CAST(floor(hi / 65536) AS BIGINT) END AS bv
        |  FROM sim, range(4) AS r(b)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
        |  FROM bands a JOIN bands c
        |    ON a.b = c.b AND a.bv = c.bv AND a.doc_id < c.doc_id)
        |SELECT doc_a, doc_b,
        |  CAST(bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo))
        |    AS BIGINT) AS hamming
        |FROM cand
        |JOIN sim x ON x.doc_id = doc_a
        |JOIN sim y ON y.doc_id = doc_b
        |WHERE bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    // Audio fingerprint ground truth: modulatedWav samples, window
    // w = (i·65) // 650, Long energy sums, gradient bits — all integer.
    "q_m7_audio_fingerprint" ->
      """WITH s AS (
        |  SELECT doc_id, i,
        |    (doc_id * 2654435761 + i * i * ((doc_id % 97) + 3)
        |      + i * ((doc_id % 31) + 17)) % 65536 - 32768 AS v
        |  FROM (SELECT doc_id, unnest(range(0, 650)) AS i FROM documents)),
        |e AS (
        |  SELECT doc_id, (i * 65) // 650 AS w, sum(v * v) AS en
        |  FROM s GROUP BY doc_id, (i * 65) // 650),
        |bits AS (
        |  SELECT a.doc_id, a.w AS b,
        |    CASE WHEN n.en > a.en THEN 1 ELSE 0 END AS bit
        |  FROM e a JOIN e n ON n.doc_id = a.doc_id AND n.w = a.w + 1
        |  WHERE a.w < 64)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN b >= 32
        |    THEN CAST(pow(2, b - 32) AS BIGINT) * bit ELSE 0 END)
        |    AS BIGINT) AS hi,
        |  CAST(sum(CASE WHEN b < 32
        |    THEN CAST(pow(2, b) AS BIGINT) * bit ELSE 0 END)
        |    AS BIGINT) AS lo
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Audio near-dup: same hash over the planted corpus, q_x21's band
    // structure, in-join Hamming verify.
    "q_m8_audio_neardup" ->
      """WITH corpus AS (
        |  SELECT doc_id, doc_id AS seed FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, doc_id AS seed
        |  FROM documents WHERE doc_id % 5 = 0),
        |s AS (
        |  SELECT doc_id, i,
        |    (seed * 2654435761 + i * i * ((seed % 97) + 3)
        |      + i * ((seed % 31) + 17)) % 65536 - 32768 AS v
        |  FROM (SELECT doc_id, seed, unnest(range(0, 650)) AS i
        |        FROM corpus)),
        |e AS (
        |  SELECT doc_id, (i * 65) // 650 AS w, sum(v * v) AS en
        |  FROM s GROUP BY doc_id, (i * 65) // 650),
        |bits AS (
        |  SELECT a.doc_id, a.w AS b,
        |    CASE WHEN n.en > a.en THEN 1 ELSE 0 END AS bit
        |  FROM e a JOIN e n ON n.doc_id = a.doc_id AND n.w = a.w + 1
        |  WHERE a.w < 64),
        |sim AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN b >= 32
        |      THEN CAST(pow(2, b - 32) AS BIGINT) * bit ELSE 0 END)
        |      AS BIGINT) AS hi,
        |    CAST(sum(CASE WHEN b < 32
        |      THEN CAST(pow(2, b) AS BIGINT) * bit ELSE 0 END)
        |      AS BIGINT) AS lo
        |  FROM bits GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, b,
        |    CASE b WHEN 0 THEN lo % 65536
        |           WHEN 1 THEN CAST(floor(lo / 65536) AS BIGINT)
        |           WHEN 2 THEN hi % 65536
        |           ELSE CAST(floor(hi / 65536) AS BIGINT) END AS bv
        |  FROM sim, range(4) AS r(b)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
        |  FROM bands a JOIN bands c
        |    ON a.b = c.b AND a.bv = c.bv AND a.doc_id < c.doc_id)
        |SELECT doc_a, doc_b,
        |  CAST(bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo))
        |    AS BIGINT) AS hamming
        |FROM cand
        |JOIN sim x ON x.doc_id = doc_a
        |JOIN sim y ON y.doc_id = doc_b
        |WHERE bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    // WAV ground truth: sample i of doc d is
    // ((d·31 + i·17) mod 65536) − 32768; sums accumulate exactly in
    // BIGINT on both engines, so mean/RMS agree to the last bit before
    // rounding.
    "q_m6_wav_decode" ->
      """WITH f AS (
        |  SELECT doc_id, 100 + doc_id % 50 AS n FROM documents),
        |s AS (
        |  SELECT doc_id, n,
        |    CAST((doc_id * 31 + i * 17) % 65536 - 32768 AS BIGINT) AS v
        |  FROM (SELECT doc_id, n, unnest(range(0, n)) AS i FROM f))
        |SELECT doc_id, 8000 AS sample_rate, 1 AS channels,
        |  CAST(max(n) AS BIGINT) AS n_frames,
        |  floor(CAST(sum(v) AS DOUBLE) / max(n) * 1000000.0 + 0.5)
        |    / 1000000.0 AS mean_amp,
        |  floor(sqrt(CAST(sum(v * v) AS DOUBLE) / max(n))
        |    * 1000000.0 + 0.5) / 1000000.0 AS rms
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
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
