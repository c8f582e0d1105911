package graft

import graft.text.Unigram
import org.apache.spark.sql.functions._

/** Hand-computed hard-EM checks for the unigram tokenizer: every count
  * and log-probability below is derivable on paper. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  behavior of "Unigram.train"

  it should "converge to the hand-computed vocabulary on a tiny corpus" in {
    // words: ab (x2), b (x1); chars a, b always kept; budget leaves one
    // multi-char slot, which 'ab' wins in E-step 1 and keeps in step 2
    val df = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val vocab = Unigram.train(df, "text", vocabSize = 3, maxPieceLen = 2,
      iterations = 2)
      .orderBy("piece").collect()
    vocab.map(_.getString(0)).toSeq shouldBe Seq("a", "ab", "b")
    // E-step counts: ab:2 (both 'ab' words), b:1; 'a' floored at 1
    vocab.map(_.getLong(1)).toSeq shouldBe Seq(1L, 2L, 1L)
    // M-step over total 4: ln(1/4), ln(2/4), ln(1/4)
    vocab.map(_.getDouble(2)).toSeq.zip(
      Seq(math.log(0.25), math.log(0.5), math.log(0.25)))
      .foreach { case (got, want) => got shouldBe want +- 1e-12 }
  }

  it should "be invariant to partitioning and respect the vocab budget" in {
    val docs = (1L to 60L)
      .map(i => (i, s"alpha beta gamma alp${i % 5} beta"))
      .toDF("doc_id", "text")
    def run(parts: Int): Seq[(String, Long)] =
      Unigram.train(docs.repartition(parts), "text", vocabSize = 20,
        maxPieceLen = 3, iterations = 3)
        .orderBy("piece").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
    val a = run(1)
    a shouldBe run(7)
    a.size should be <= 20
    // chars present in the corpus always survive pruning
    val pieces = a.map(_._1).toSet
    Seq("a", "b", "g", "l", "m", "p", "t", "h")
      .foreach(c => pieces should contain(c))
  }

  behavior of "Unigram.tokenize"

  it should "segment by Viterbi and reconstruct the input words" in {
    val df = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val vocab = Unigram.train(df, "text", vocabSize = 3, maxPieceLen = 2,
      iterations = 2)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toSeq
    val toks = Unigram.tokenize(
      Seq((10L, "ab abb"), (11L, null.asInstanceOf[String]))
        .toDF("id", "text"), "id", "text", vocab, maxPieceLen = 2)
      .orderBy("id").collect()
    // 'ab' -> [ab]; 'abb' -> [ab, b] (one unknown-free path wins)
    toks(0).getSeq[String](1) shouldBe Seq("ab", "ab", "b")
    toks(0).getLong(2) shouldBe 3L
    toks(1).getSeq[String](1) shouldBe Seq.empty
    // pieces always reconstruct the word stream (full coverage)
    toks(0).getSeq[String](1).mkString shouldBe "ababb"
  }

  it should "fall back to unknown single characters instead of failing" in {
    val toks = Unigram.tokenize(Seq((1L, "xq")).toDF("id", "text"),
      "id", "text", Seq("a" -> -0.5), maxPieceLen = 2)
      .collect()
    toks(0).getSeq[String](1) shouldBe Seq("x", "q")
  }
}
