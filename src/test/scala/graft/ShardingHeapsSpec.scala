package graft

import org.apache.spark.sql.functions._

class ShardingHeapsSpec extends SparkSpec {
  import spark.implicits._

  behavior of "relational.Sharding, dq.Stats.pairedT, text.TextStats.heapsLawFit"

  it should "move only winners-to-the-new-shard when a shard is added" in {
    val ids = (1L to 2000L).toDF("id")
    val a = graft.relational.Sharding.rendezvousShards(ids, "id", 8)
      .select(col("id"), col("shard").as("s8"))
    val b = graft.relational.Sharding.rendezvousShards(ids, "id", 9)
      .select(col("id"), col("shard").as("s9"))
    val j = a.join(b, "id").as[(Long, Int, Int)].collect()
    val moved = j.filter(r => r._2 != r._3)
    // the HRW property: every moved row moves TO the new shard
    moved.foreach(_._3 shouldBe 8)
    // expected movement 1/9 ~ 222; generous bound
    moved.length.toDouble / j.length should be < 0.2
    moved.length should be > 100
    // rows are spread over all shards, none starved
    val byShard = j.groupBy(_._2).view.mapValues(_.length)
    byShard.keySet shouldBe (0 until 8).toSet
    byShard.values.foreach(_ should be > 100)
  }

  it should "match the hand-computed paired-t fixture and drop incomplete pairs" in {
    val df = Seq((10.0, 12.0), (12.0, 15.0), (11.0, 12.0), (13.0, 15.0))
      .toDF("before", "after")
    val r = graft.dq.Stats.pairedT(df, col("before"), col("after"))
      .as[(Long, Option[Double], Option[Double], Option[Double], Long,
        Option[Double])].collect().head
    r._1 shouldBe 4L
    r._2.get shouldBe 2.0 +- 1e-9
    r._3.get shouldBe 0.816497 +- 1e-9
    r._4.get shouldBe 4.898979 +- 1e-9
    r._5 shouldBe 3L
    r._6.get shouldBe 1e-6 +- 1e-9
    val withNulls = Seq((Some(1.0), Some(2.0)), (None, Some(5.0)),
      (Some(3.0), None)).toDF("before", "after")
    graft.dq.Stats.pairedT(withNulls, col("before"), col("after"))
      .select(col("n")).as[Long].collect().head shouldBe 1L
  }

  it should "fit beta near 1 for all-new vocab and near 0 for a fixed vocab" in {
    // each doc introduces 5 brand-new tokens -> V(N) = 5N, beta = 1
    val fresh = (1L to 60L).map(i =>
      (i, (1 to 5).map(j => s"tok_${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val rf = graft.text.TextStats.heapsLawFit(fresh, "doc_id", "text")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    rf._1 shouldBe 60L
    rf._2 shouldBe 300L
    rf._3.get shouldBe 1.0 +- 1e-6
    rf._4.get shouldBe 5.0 +- 1e-5
    rf._5.get shouldBe 1.0 +- 1e-9
    // every doc repeats the same 5 tokens -> V flat after doc 1: only
    // the first doc contributes a curve point (v > 0 filter keeps all,
    // but V(N) = 5 for all N) -> beta = 0
    val flat = (1L to 60L).map(i => (i, "a b c d e"))
      .toDF("doc_id", "text")
    val rl = graft.text.TextStats.heapsLawFit(flat, "doc_id", "text")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    rl._2 shouldBe 5L
    rl._3.get shouldBe 0.0 +- 1e-9
  }
}
