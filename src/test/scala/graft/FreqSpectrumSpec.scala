package graft

import org.apache.spark.sql.functions._

class FreqSpectrumSpec extends SparkSpec {
  import spark.implicits._

  behavior of "TextStats.goodTuring and TextStats.zipfLawFit"

  it should "build the hand-computed frequency histogram with a tail bucket" in {
    // words: a x5, b x2, c x2, d x1, e x1, f x1 -> N1=3, N2=2, N5->tail(r>2)
    val docs = Seq((1L, "a a a b c d"), (2L, "a a b c e f"))
      .toDF("doc_id", "text")
    val r = graft.text.TextStats
      .goodTuring(docs, "doc_id", "text", maxR = 2)
      .orderBy(col("r"))
      .as[(Long, Long, Long, Double, Double)].collect()
    // r=-1 tail: type a (5 tokens); r=1: d,e,f; r=2: b,c
    r(0) shouldBe (-1L, 1L, 5L, 0.166667, 0.416667)
    r(1)._1 shouldBe 1L
    r(1)._2 shouldBe 3L
    r(1)._5 shouldBe 0.25 +- 1e-9 // unseen-mass estimate N1/N = 3/12
    r(2) shouldBe (2L, 2L, 4L, 0.333333, 0.333333)
  }

  "TextStats.chao1Richness (X162)" should "hand-compute the bias-corrected estimate and coverage" in {
    // tokens: a x1, b x1, c x2, d x5 -> N=9, D=4, f1=2, f2=1
    // chao1 = 4 + 2*1/(2*(1+1)) = 4.5; coverage = 1 - 2/9
    val docs = Seq((1L, "a b c c d d d d d")).toDF("doc_id", "text")
    val r = graft.text.TextStats.chao1Richness(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    r shouldBe ((9L, 4L, 2L, 1L, 4.5, 0.5,
      math.floor((1.0 - 2.0 / 9.0) * 1e6 + 0.5) / 1e6))
    // no singletons -> coverage 1, chao1 = D exactly (f1 term vanishes)
    val full = Seq((1L, "a a b b")).toDF("doc_id", "text")
    graft.text.TextStats.chao1Richness(full, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double, Double, Double)]
      .head() shouldBe ((4L, 2L, 0L, 2L, 2.0, 0.0, 1.0))
  }

  it should "recover an exact power law's slope" in {
    // counts 16,8,4,2 over 4 types -> ln(freq) = ln16 - ln2 * ln(rank)/ln2…
    // exact log-log line: freq = 16 * rank^(-2): ranks 1,2 -> 16,4
    val words = Seq.fill(16)("a") ++ Seq.fill(4)("b") ++ Seq("z")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val r = graft.text.TextStats
      .zipfLawFit(docs, "doc_id", "text", minCount = 2)
      .select(col("slope"), col("r2"))
      .as[(Double, Double)].collect().head
    // two points (1,16),(2,4): slope = (ln4-ln16)/(ln2-ln1) = -2
    r._1 shouldBe -2.0 +- 1e-5
    r._2 shouldBe 1.0 +- 1e-6
  }

  it should "NULL the fit when fewer than two ranked types exist" in {
    val docs = Seq((1L, "a a a")).toDF("doc_id", "text")
    val r = graft.text.TextStats
      .zipfLawFit(docs, "doc_id", "text", minCount = 2)
      .select(col("slope")).as[Option[Double]].collect().head
    r shouldBe None
  }
}
