package graft

import graft.ml.TextClassifier
import graft.text.Retrieval
import org.apache.spark.sql.functions._

/** Closed-form checks for the NB classifier and BM25 ranking — tiny
  * hand-computed corpora where every log-probability and score is
  * derivable on paper. */
class ClassifierRetrievalSpec extends SparkSpec {
  import spark.implicits._

  behavior of "TextClassifier"

  it should "recover hand-computed NB posteriors, argmax and margin" in {
    // V = {a,b,c,d} -> 4; class X: 4 tokens (a:3, b:1), class Y: 3 (c:2, d:1)
    val train = Seq(("a a a b", "X"), ("c c d", "Y")).toDF("text", "lab")
    val model = TextClassifier.train(train, "text", "lab")
    val out = TextClassifier.score(model,
      Seq((1L, "a a"), (2L, "c d")).toDF("doc_id", "text"),
      "doc_id", "text")
      .orderBy("doc_id")
      .collect()
    out.map(_.getString(1)).toSeq shouldBe Seq("X", "Y")
    // doc 1 under X: ln(1/2) + 2*ln((3+1)/(4+4)) = 3 ln 0.5 = -2.0794
    out(0).getDouble(2) shouldBe -2.079 +- 1e-9
    // under Y: ln(1/2) + 2*ln((0+1)/(3+4)) = -4.585; margin 2.506
    out(0).getDouble(3) shouldBe 2.506 +- 1e-9
  }

  it should "smooth unseen tokens instead of zeroing the posterior" in {
    val model = TextClassifier.train(
      Seq(("a a", "X"), ("b b", "Y")).toDF("text", "lab"), "text", "lab")
    val out = TextClassifier.score(model,
      Seq((1L, "zz a")).toDF("doc_id", "text"), "doc_id", "text")
      .collect()
    out.length shouldBe 1
    out(0).getString(1) shouldBe "X" // the seen token decides
  }

  behavior of "Retrieval.bm25TopK"

  it should "rank by hand-computed BM25 and drop non-matching docs" in {
    val corpus = Seq((1L, "a a b"), (2L, "a c"), (3L, "b c"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(spark, corpus, "doc_id", "text",
      Seq("q" -> "a"), k = 5)
      .orderBy("rank").collect()
    // N=3, avgdl=7/3, df(a)=2, idf=ln(1.6); doc3 never matches
    out.map(_.getLong(1)).toSeq shouldBe Seq(1L, 2L)
    out(0).getDouble(3) shouldBe 0.5982 +- 1e-9
    out(1).getDouble(3) shouldBe 0.4992 +- 1e-9
  }

  it should "treat repeated query terms as a set and honour k" in {
    val corpus = Seq((1L, "a b"), (2L, "a a"), (3L, "a"), (4L, "a a a"))
      .toDF("doc_id", "text")
    val once = Retrieval.bm25TopK(spark, corpus, "doc_id", "text",
      Seq("q" -> "a"), k = 2).collect()
    val twice = Retrieval.bm25TopK(spark, corpus, "doc_id", "text",
      Seq("q" -> "a a"), k = 2).collect()
    once.length shouldBe 2
    once.map(r => (r.getLong(1), r.getDouble(3))).toSeq shouldBe
      twice.map(r => (r.getLong(1), r.getDouble(3))).toSeq
  }
}
