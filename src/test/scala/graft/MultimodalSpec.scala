package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.asMedia(
    Seq((1L, "abcdefgh"), (2L, "xy"), (3L, "0123456789" * 60))
      .toDF("id", "payload"),
    "id", "payload", lit("video"))

  it should "carry byte length and checksum metadata" in {
    val m = media.select(col("id"), col("meta.byte_len")).as[(Long, Long)]
      .collect().toMap
    m shouldBe Map(1L -> 8L, 2L -> 2L, 3L -> 600L)
  }

  it should "explode capped deterministic frame samples" in {
    val f = Multimodal.frameSamples(media, "id", frameStride = 100L, maxFrames = 4)
      .select("id", "frame_idx", "byte_offset").as[(Long, Long, Long)].collect()
    // only id=3 has >=100 bytes; 600/100=6 capped at 4 frames
    f.map(_._1).distinct shouldBe Array(3L)
    f.map(t => (t._2, t._3)).sorted shouldBe
      Array((0L, 0L), (1L, 100L), (2L, 200L), (3L, 300L))
  }

  it should "decode per-partition batched features from the payload" in {
    val feats = Multimodal.decodeFeatures(media, "id", dim = 4)
      .select("id", "features").as[(Long, Seq[Double])].collect().toMap
    feats(1L) shouldBe Seq('a'.toDouble, 'b'.toDouble, 'c'.toDouble, 'd'.toDouble)
    feats(2L) shouldBe Seq('x'.toDouble, 'y'.toDouble, 0.0, 0.0) // padded
  }

  it should "rebalance partitions without losing rows or columns" in {
    val parts = Multimodal.repartitionBySize(media, 2)
    parts.count() shouldBe 3 // layout-only change
    parts.columns shouldBe media.columns
    parts.rdd.getNumPartitions shouldBe 2
    // round-robin spreads the rows over both partitions
    parts.rdd.mapPartitions(it => Iterator(it.size)).collect().max should be <= 2
  }
}
