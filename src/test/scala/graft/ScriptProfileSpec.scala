package graft

import org.apache.spark.sql.functions._

class ScriptProfileSpec extends SparkSpec {
  import spark.implicits._

  behavior of "TextStats.scriptProfile"

  it should "count codepoint classes and pick the dominant script" in {
    val docs = Seq(
      (1L, "hello world 42"),
      (2L, "привет мир"),
      (3L, "你好世界"),
      (4L, "مرحبا"),
      (5L, ""),
      (6L, "ab привет")).toDF("doc_id", "text")
    val r = graft.text.TextStats.scriptProfile(docs, "doc_id", "text")
      .orderBy(col("id"))
      .select(col("id"), col("n_latin"), col("n_cyrillic"), col("n_cjk"),
        col("n_arabic"), col("n_digit"), col("n_space"), col("n_chars"),
        col("dominant_script"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, String)]
      .collect()
    r(0) shouldBe (1L, 10L, 0L, 0L, 0L, 2L, 2L, 14L, "latin")
    r(1) shouldBe (2L, 0L, 9L, 0L, 0L, 0L, 1L, 10L, "cyrillic")
    r(2) shouldBe (3L, 0L, 0L, 4L, 0L, 0L, 0L, 4L, "cjk")
    r(3) shouldBe (4L, 0L, 0L, 0L, 5L, 0L, 0L, 5L, "arabic")
    r(4)._9 shouldBe "none"
    // tie 2 latin vs 6 cyrillic -> cyrillic dominates by count
    r(5)._9 shouldBe "cyrillic"
  }

  it should "quantize ratios over total length" in {
    val docs = Seq((1L, "ab!!")).toDF("doc_id", "text")
    val r = graft.text.TextStats.scriptProfile(docs, "doc_id", "text")
      .select(col("latin_ratio"), col("nonspace_other_ratio"))
      .as[(Double, Double)].collect().head
    r._1 shouldBe 0.5 +- 1e-9
    r._2 shouldBe 0.5 +- 1e-9 // the two '!' are unclassified
  }
}
