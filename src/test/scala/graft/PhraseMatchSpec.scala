package graft

import graft.text.PhraseMatch
import org.apache.spark.sql.functions._

/** Aho–Corasick contract checks: all-occurrence (overlapping) counts,
  * suffix-output propagation through fail links, case folding, and
  * equivalence with per-phrase regex counting when phrases cannot
  * overlap themselves. */
class PhraseMatchSpec extends SparkSpec {
  import spark.implicits._

  behavior of "PhraseMatch.tagPhrases"

  it should "count overlapping occurrences (all end positions)" in {
    val out = PhraseMatch.tagPhrases(
      Seq((1L, "aaa bb aaaa")).toDF("id", "text"), "id", "text",
      Seq("aa"))
      .collect()
    out.length shouldBe 1
    out(0).getLong(2) shouldBe 5L // aaa -> 2, aaaa -> 3
  }

  it should "emit suffix matches via fail links (the classic ushers case)" in {
    val out = PhraseMatch.tagPhrases(
      Seq((1L, "ushers")).toDF("id", "text"), "id", "text",
      Seq("he", "she", "hers", "his"))
      .orderBy("phrase").collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    out shouldBe Seq(("he", 1L), ("hers", 1L), ("she", 1L))
  }

  it should "fold case on both sides" in {
    val out = PhraseMatch.tagPhrases(
      Seq((1L, "Free MONEY and free money")).toDF("id", "text"),
      "id", "text", Seq("FREE Money"))
      .collect()
    out(0).getLong(2) shouldBe 2L
  }

  it should "agree with per-phrase regex counts on generated docs" in {
    val docs = (1L to 40L).map { i =>
      (i, s"alpha w$i beta gamma w${i % 7} alpha beta" +
        (if (i % 4 == 0) " alpha beta" else ""))
    }.toDF("id", "text")
    val phrases = Seq("alpha beta", "gamma w3", "missing phrase")
    val got = PhraseMatch.tagPhrases(docs, "id", "text", phrases)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val want = phrases.flatMap { p =>
      docs.select(col("id"),
        regexp_count(lower(col("text")), lit(java.util.regex.Pattern.quote(p)))
          .cast("long").as("n"))
        .collect().map(r => (r.getLong(0), p, r.getLong(1)))
        .filter(_._3 > 0)
    }.toSet
    want should not be empty
    got shouldBe want
  }
}
