package graft

import org.apache.spark.sql.functions._

class RakeSpec extends SparkSpec {
  import spark.implicits._

  behavior of "Rake.rakeKeywords (X163)"

  it should "score hand-computed phrases by summed deg/freq ratios" in {
    // stopword 'is' splits "deep learning is deep" into phrases
    // [deep learning], [deep]: freq(deep)=2, deg(deep)=2+1=3 -> 1.5;
    // freq(learning)=1, deg=2 -> 2.0. Scores: "deep learning" 3.5,
    // "deep" 1.5.
    val docs = Seq((1L, "deep learning is deep")).toDF("doc_id", "text")
    val r = graft.text.Rake.rakeKeywords(docs, "doc_id", "text",
        topK = 10, stopwords = Seq("is"))
      .as[(String, Long, Long, Double)].collect()
    r.length shouldBe 2
    r(0) shouldBe (("deep learning", 2L, 1L, 3.5))
    r(1) shouldBe (("deep", 1L, 1L, 1.5))
  }

  it should "merge identical phrase occurrences and keep multi-word phrases above their constituents" in {
    // "red apple" occurs twice (one per doc); its score (2+2=4) beats
    // the single word "apple" (2) and "red" (2) would score alone
    val docs = Seq((1L, "the red apple of the red apple"),
      (2L, "a red apple")).toDF("doc_id", "text")
    val r = graft.text.Rake.rakeKeywords(docs, "doc_id", "text",
        topK = 5, stopwords = Seq("the", "of", "a"))
      .as[(String, Long, Long, Double)].collect()
    r(0)._1 shouldBe "red apple"
    r(0)._3 shouldBe 3L // three occurrences across the corpus
    r(0)._4 shouldBe 4.0 // freq(red)=freq(apple)=3, deg=6 -> 2 + 2
  }

  it should "be partition-invariant and respect topK ordering ties by phrase" in {
    val docs = (1L to 40L).map(i =>
      (i, s"alpha beta is gamma_$i delta is alpha beta"))
      .toDF("doc_id", "text")
    def run(parts: Int) = graft.text.Rake.rakeKeywords(
      docs.repartition(parts), "doc_id", "text", topK = 8,
      stopwords = Seq("is"))
      .as[(String, Long, Long, Double)].collect().toSeq
    val a = run(2)
    a shouldBe run(7)
    a.head._1 shouldBe "alpha beta" // 80 occurrences dominate
    graft.util.Caches.releaseAll(spark)
  }
}
