package graft

import org.apache.spark.sql.functions._

/** X171 vocab JS drift + X172 Yule's K + X173 term burstiness — the
  * round-12 corpus-health tier, pinned on hand-computed values. */
class TextDriftSpec extends SparkSpec {
  import spark.implicits._

  private def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  behavior of "TextStats.yuleK (X172)"

  it should "reproduce the hand-computed K and legomena ratios" in {
    // "a a a b b c": counts (3,2,1), N=6, m2=14 ->
    // K = 1e4*(14-6)/36; hapax=c, dis=b
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val r = graft.text.TextStats.yuleK(docs, "text")
      .as[(Long, Long, Long, Long, Double, Double, Double)]
      .collect().head
    r._1 shouldBe 3L; r._2 shouldBe 6L; r._3 shouldBe 1L; r._4 shouldBe 1L
    r._5 shouldBe q6(1e4 * 8.0 / 36.0)
    r._6 shouldBe q6(1.0 / 3.0)
    r._7 shouldBe q6(1.0 / 3.0)
  }

  it should "rise with repetitiveness and be partition-invariant" in {
    val varied = (1L to 60L).map(i => (i, s"w$i u$i v$i"))
      .toDF("doc_id", "text")
    val template = (1L to 60L).map(i => (i, "same words every time"))
      .toDF("doc_id", "text")
    def k(df: org.apache.spark.sql.DataFrame) =
      graft.text.TextStats.yuleK(df, "text")
        .select(col("yule_k")).as[Double].collect().head
    k(template) should be > k(varied)
    k(varied.repartition(7)) shouldBe k(varied)
  }

  behavior of "TextStats.vocabJsDivergence (X171)"

  it should "reproduce hand-computed JS and census columns" in {
    // a = "x x y" (p: x 2/3, y 1/3), b = "x z" (q: x 1/2, z 1/2)
    val a = Seq((1L, "x x y")).toDF("doc_id", "text")
    val b = Seq((2L, "x z")).toDF("doc_id", "text")
    val r = graft.text.TextStats.vocabJsDivergence(a, b, "text")
      .as[(Long, Long, Long, Long, Long, Double)].collect().head
    r._1 shouldBe 3L; r._2 shouldBe 2L
    r._3 shouldBe 2L; r._4 shouldBe 2L; r._5 shouldBe 1L
    // replicate the operator's scaled-term arithmetic exactly
    def term(p: Double, q: Double): Double = {
      val m = (p + q) / 2.0
      (if (p > 0) p * math.log(p / m) else 0.0) +
        (if (q > 0) q * math.log(q / m) else 0.0)
    }
    val scaled = Seq(term(2.0 / 3.0, 1.0 / 2.0), // x
      term(1.0 / 3.0, 0.0),                       // y
      term(0.0, 1.0 / 2.0))                       // z
      .map(t => math.floor(t * 1e15 + 0.5).toLong).sum
    r._6 shouldBe q6(0.5 * scaled.toDouble / 1e15)
  }

  it should "be zero on identical corpora, symmetric, and partition-invariant" in {
    val a = (1L to 40L).map(i => (i, s"alpha beta w${i % 7}"))
      .toDF("doc_id", "text")
    val b = (1L to 40L).map(i => (i, s"alpha gamma w${i % 5}"))
      .toDF("doc_id", "text")
    def js(x: org.apache.spark.sql.DataFrame,
        y: org.apache.spark.sql.DataFrame) =
      graft.text.TextStats.vocabJsDivergence(x, y, "text")
        .select(col("js")).as[Double].collect().head
    js(a, a) shouldBe 0.0
    js(a, b) shouldBe js(b, a)
    js(a, b) should be > 0.0
    js(a.repartition(9), b.repartition(3)) shouldBe js(a, b)
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "TextStats.termBurstiness (X173)"

  it should "reproduce the hand dispersion table via the zero-folding identity" in {
    // a: df=2, tf=4, s2=10 -> rate 2, vmr 10/4 - 4/3;
    // b: df=3, tf=4, s2=6 -> rate 4/3, vmr 6/4 - 4/3
    val docs = Seq((1L, "a a a b"), (2L, "a b"), (3L, "b b"))
      .toDF("doc_id", "text")
    val r = graft.text.TextStats.termBurstiness(docs, "doc_id", "text",
        minDf = 2)
      .orderBy(col("token"))
      .as[(String, Long, Long, Double, Double)].collect()
    r(0) shouldBe (("a", 2L, 4L, 2.0, q6(10.0 / 4.0 - 4.0 / 3.0)))
    r(1) shouldBe (("b", 3L, 4L, q6(4.0 / 3.0), q6(6.0 / 4.0 - 4.0 / 3.0)))
  }

  it should "rank a clumped term above an evenly-spread one" in {
    // 'even' once per doc (VMR ~ Poisson-ish); 'burst' all in one doc
    val docs = (1L to 30L).map(i =>
      (i, if (i == 1) "even " + Seq.fill(30)("burst").mkString(" ")
      else "even filler")).toDF("doc_id", "text")
    val m = graft.text.TextStats.termBurstiness(docs, "doc_id", "text",
        minDf = 1)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(t => t._1 -> t._5).toMap
    m("burst") should be > m("even")
  }
}
