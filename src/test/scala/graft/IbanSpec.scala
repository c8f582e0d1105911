package graft

import org.apache.spark.sql.functions._

class IbanSpec extends SparkSpec {
  import spark.implicits._

  behavior of "TextStats.ibanCandidates"

  it should "pass known-valid IBANs and fail tampered ones" in {
    val docs = Seq(
      (1L, "wire to DE89370400440532013000 today"),
      (2L, "wire to DE89370400440532013001 today"), // last digit flipped
      (3L, "gb one GB82WEST12345698765432 ok"),     // valid
      (4L, "lowercase de89370400440532013000 still found"),
      (5L, "no accounts here")).toDF("doc_id", "text")
    val r = graft.text.TextStats.ibanCandidates(docs, "doc_id", "text")
      .orderBy(col("id"))
      .select(col("id"), col("iban_valid"))
      .as[(Long, Int)].collect()
    r.map(_._1).toSeq shouldBe Seq(1L, 2L, 3L, 4L)
    r.map(_._2).toSeq shouldBe Seq(1, 0, 1, 1)
  }

  it should "keep the accumulator in int range on the longest IBANs" in {
    // 34-char candidates: the fold reduces mod 97 every step, so the
    // accumulator is < 97*100 + 35 always; a valid long IBAN checks out
    val valid = "MT84MALT011000012345MTLCAST001S" // 31 chars, valid
    val docs = Seq((1L, s"x $valid y")).toDF("doc_id", "text")
    val r = graft.text.TextStats.ibanCandidates(docs, "doc_id", "text")
      .select(col("n_chars"), col("iban_valid"))
      .as[(Long, Int)].collect().head
    r._1 shouldBe 31L
    r._2 shouldBe 1
  }
}
