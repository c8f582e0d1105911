package graft

import org.apache.spark.sql.functions._

class CoverageSelectSpec extends SparkSpec {
  import spark.implicits._

  behavior of "Curation.greedyCoverageSelect"

  it should "pick by marginal gain with id tie-breaks and stop at zero gain" in {
    // 3-shingle sets: d1 {abc,bcd,cde,def}; d2 shares {abc,bcd} with d1
    // and adds {cdx,dxy}; d3 adds {pqr,qrs}; d4 duplicates d1 exactly.
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d x y"),
      (3L, "p q r s"),
      (4L, "a b c d e f")).toDF("doc_id", "text")
    val r = graft.curate.Curation
      .greedyCoverageSelect(docs, "doc_id", "text", k = 5)
      .orderBy(col("pick_rank"))
      .as[(Long, Long, Long, Long)].collect()
    // pick 1: d1 (4 shingles; d4 ties at 4 -> id tie-break takes d1)
    r(0) shouldBe (1L, 1L, 4L, 4L)
    // pick 2: d2 and d3 both add 2 -> id tie-break takes d2
    r(1) shouldBe (2L, 2L, 2L, 6L)
    r(2) shouldBe (3L, 3L, 2L, 8L)
    // d4 adds nothing -> early stop: 3 picks, not 5
    r.length shouldBe 3
  }

  it should "equal the per-doc distinct shingle count on disjoint docs" in {
    val docs = Seq(
      (1L, "a a a a a"),   // 3 shingles, all identical -> 1 distinct
      (2L, "x y z w")).toDF("doc_id", "text")
    val r = graft.curate.Curation
      .greedyCoverageSelect(docs, "doc_id", "text", k = 2)
      .orderBy(col("pick_rank"))
      .as[(Long, Long, Long, Long)].collect()
    r(0) shouldBe (1L, 2L, 2L, 2L) // d2: {xyz, yzw}
    r(1) shouldBe (2L, 1L, 1L, 3L) // d1: the single repeated shingle
  }
}
