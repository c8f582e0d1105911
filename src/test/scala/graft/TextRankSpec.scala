package graft

import org.apache.spark.sql.functions._

class TextRankSpec extends SparkSpec {
  import spark.implicits._

  behavior of "TextRank.textRankKeywords"

  it should "hit the exact symmetric fixed point on a 2-token cycle" in {
    // "alpha beta alpha" -> edges alpha<->beta, both deg 1, n = 2:
    // unit = 5e11; every iteration pr = 3*unit/20 + 17*unit/20 = unit
    // exactly (both divisions land on integers)
    val docs = Seq((1L, "alpha beta alpha")).toDF("doc_id", "text")
    val r = graft.text.TextRank.textRankKeywords(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect()
    r.map(_._1).sorted shouldBe Array("alpha", "beta")
    r.foreach { case (_, pr, deg) =>
      pr shouldBe 500000000000L
      deg shouldBe 1L
    }
  }

  it should "rank the hub of a star above its leaves" in {
    val docs = Seq(
      (1L, "aaaa center bbbb center cccc"),
      (2L, "dddd center")).toDF("doc_id", "text")
    val r = graft.text.TextRank.textRankKeywords(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect()
    r.head._1 shouldBe "center"
    r.head._3 shouldBe 4L
    val leafRanks = r.filter(_._1 != "center").map(_._2)
    leafRanks.foreach(_ should be < r.head._2)
    // leaves are symmetric -> identical exact integer ranks
    leafRanks.toSet.size shouldBe 1
  }

  it should "drop short tokens and be partition-invariant" in {
    val docs = Seq(
      (1L, "of the analysis pipeline of the analysis"),
      (2L, "pipeline analysis at it"))
      .toDF("doc_id", "text")
    val a = graft.text.TextRank.textRankKeywords(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect()
    a.map(_._1) should not contain "the"
    a.map(_._1) should not contain "of"
    val b = graft.text.TextRank.textRankKeywords(
        docs.repartition(7), "doc_id", "text")
      .as[(String, Long, Long)].collect()
    b shouldBe a
  }

  it should "return an empty typed frame when no graph survives" in {
    val docs = Seq((1L, "a of it")).toDF("doc_id", "text")
    val r = graft.text.TextRank.textRankKeywords(docs, "doc_id", "text")
    r.columns shouldBe Array("token", "rank_scaled", "degree")
    r.count() shouldBe 0L
  }
}
