package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with typed metadata alongside
  * (north-star scope; the reference has no media handling).
  *
  * The Spark-side plumbing — schema, per-partition batched decoding,
  * size-aware repartitioning, frame-sample explosion — is real and tested.
  * The actual byte decoding is STUBBED: this container ships no image or
  * audio codecs, so [[decodeFeatures]]'s "decoder" is a deterministic fake
  * (first bytes as doubles) behind the exact iterator-per-partition shape a
  * JNI/FFMPEG-backed decoder would use (expensive init once per partition,
  * then streaming over rows).
  *
  * Scale notes: media blobs are heavily skewed — [[repartitionBySize]]
  * round-robins rows so partitions carry statistically comparable byte
  * loads and one partition of 4K-video rows cannot straggle a stage
  * (ingest order usually clusters assets of one size). Metadata-only
  * operations (length, checksum, frame counts) never touch the payload
  * beyond the projected expressions — with parquet column pruning, a
  * metadata query does not even read the blob pages when metadata is
  * materialized as its own column.
  */
object Multimodal {

  /** Promote a payload column to the standard media schema:
    * `content binary`, `media_type`, `meta struct<byte_len, checksum>`. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
      mediaTypeCol: Column): DataFrame =
    df.select(
      col(idCol),
      col(payloadCol).cast("binary").as("content"),
      mediaTypeCol.as("media_type"))
      .withColumn("meta", struct(
        length(col("content")).cast("long").as("byte_len"),
        md5(col("content")).as("checksum")))

  type Column = org.apache.spark.sql.Column

  /** Deterministic frame-sampling plan for video rows: one frame every
    * `frameStride` bytes, capped at `maxFrames` — exploded to
    * (id, frame_idx, byte_offset) rows. A real pipeline would hand each
    * (content, byte_offset) to the decoder; the explosion, capping and
    * offset arithmetic are the actual distributed work. */
  def frameSamples(media: DataFrame, idCol: String, frameStride: Long,
      maxFrames: Int): DataFrame = {
    val n = least(floor(col("meta.byte_len") / frameStride).cast("long"),
      lit(maxFrames.toLong))
    media.filter(col("media_type") === "video" && n > 0)
      .select(col(idCol), posexplode(sequence(lit(0L), n - 1)))
      .select(col(idCol), col("pos").cast("long").as("frame_idx"),
        (col("col") * frameStride).as("byte_offset"))
  }

  /** STUB decoder: batched per-partition feature extraction over the binary
    * payload. The fake "decoder" reads the first `dim` bytes as doubles;
    * swap `init`/`decode` for a real codec without touching the plumbing. */
  def decodeFeatures(media: DataFrame, idCol: String, dim: Int): DataFrame = {
    val schema = StructType(Seq(
      media.schema(idCol),
      StructField("features", ArrayType(DoubleType))))
    val idIdx = media.schema.fieldIndex(idCol)
    val contentIdx = media.schema.fieldIndex("content")
    val rdd = media.rdd.mapPartitions { rows =>
      // expensive-decoder-init-once-per-partition goes here (stubbed)
      val decode: Array[Byte] => Array[Double] = bytes =>
        bytes.take(dim).map(b => (b & 0xff).toDouble)
          .padTo(dim, 0.0)
      rows.map { r =>
        Row(r.get(idIdx), decode(r.getAs[Array[Byte]](contentIdx)).toSeq)
      }
    }
    media.sparkSession.createDataFrame(rdd, schema)
  }

  /** Redistribute media rows into `numPartitions` with statistically
    * balanced BYTE load via round-robin: scatters big and small payloads
    * uniformly regardless of ingest order or duplicate content (hashing on
    * a content key would send every copy of a hot asset to one partition).
    * Fully distributed — an exact cumulative-bytes assignment would need a
    * global running sum through one task, a worse bottleneck than the skew
    * it fixes. A single payload larger than a partition's fair share still
    * needs chunking upstream. */
  def repartitionBySize(media: DataFrame, numPartitions: Int): DataFrame =
    media.repartition(numPartitions)
}
