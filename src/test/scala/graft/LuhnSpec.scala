package graft

import org.apache.spark.sql.functions._

class LuhnSpec extends SparkSpec {
  import spark.implicits._

  behavior of "TextStats.luhnCardCandidates"

  it should "validate known Luhn-valid PANs and reject tampered ones" in {
    val docs = Seq(
      (1L, "pay with 4111 1111 1111 1111 thanks"),
      (2L, "ref 4539-1488-0343-6467 attached"),
      (3L, "order 1234 5678 9012 3456 shipped"),     // fails checksum
      (4L, "no numbers here"),
      (5L, "short 1234-5678 run"),                   // < 13 digits: dropped
      (6L, "amex 378282246310005 ok")                // 15-digit valid
    ).toDF("doc_id", "text")
    val r = graft.text.TextStats
      .luhnCardCandidates(docs, "doc_id", "text")
      .orderBy(col("id"))
      .as[(Long, String, String, Long, Int)].collect()
    r.map(_._1).toSeq shouldBe Seq(1L, 2L, 3L, 6L)
    val byId = r.map(x => x._1 -> x).toMap
    byId(1L)._3 shouldBe "4111111111111111"
    byId(1L)._5 shouldBe 1
    byId(2L)._5 shouldBe 1
    byId(3L)._5 shouldBe 0
    byId(6L)._4 shouldBe 15L
    byId(6L)._5 shouldBe 1
  }

  it should "keep only 13-19 digit candidates" in {
    val docs = Seq(
      (1L, "a 123456789012345678901234567890 b"), // 30 digits: regex caps
      (2L, "c 1234567890123 d")                   // exactly 13: kept
    ).toDF("doc_id", "text")
    val r = graft.text.TextStats
      .luhnCardCandidates(docs, "doc_id", "text")
      .select(col("id"), col("n_digits"))
      .as[(Long, Long)].collect().toMap
    r.get(2L) shouldBe Some(13L)
    // the 30-digit run splits into bounded candidates; any kept slice
    // sits inside 13..19
    r.values.foreach { n => n should (be >= 13L and be <= 19L) }
  }
}
