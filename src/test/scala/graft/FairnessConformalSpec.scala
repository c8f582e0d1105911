package graft

import org.apache.spark.sql.functions._

class FairnessConformalSpec extends SparkSpec {
  import spark.implicits._

  behavior of "ml.Eval groupedAuc / fairnessReport / conformalThresholds"

  it should "match hand-computed per-group AUC including ties and degenerate groups" in {
    // g1: scores (1,+) (2,+) (0,-) -> perfect separation, AUC 1
    // g2: scores (1,+) (1,-) (2,-) -> pos ties one neg (0.5), beaten by
    //     the other: AUC = 0.5/2 = 0.25
    // g3: only positives -> NULL
    val df = Seq(
      ("g1", 1.0, 1), ("g1", 2.0, 1), ("g1", 0.0, 0),
      ("g2", 1.0, 1), ("g2", 1.0, 0), ("g2", 2.0, 0),
      ("g3", 5.0, 1)).toDF("g", "s", "y")
    val r = graft.ml.Eval.groupedAuc(df, "g", col("s"), col("y"))
      .orderBy(col("g"))
      .as[(String, Long, Long, Option[Double])].collect()
    r(0) shouldBe ("g1", 2L, 1L, Some(1.0))
    r(1)._4.get shouldBe 0.25 +- 1e-12
    r(2) shouldBe ("g3", 1L, 0L, None)
  }

  it should "agree with pooled rocAuc when there is a single group" in {
    val df = Seq.tabulate(40)(i =>
      ("all", (i * 7 % 13).toDouble, if (i % 3 == 0) 1 else 0))
      .toDF("g", "s", "y")
    val pooled = graft.ml.Eval.rocAuc(df, col("s"), col("y"))
      .select(col("auc")).as[Double].collect().head
    val grouped = graft.ml.Eval.groupedAuc(df, "g", col("s"), col("y"))
      .select(col("auc")).as[Double].collect().head
    grouped shouldBe pooled +- 1e-15
  }

  it should "match the hand-computed fairness fixture" in {
    // A: 4 rows, sel 2, pos 2, tp 2, fp 0 -> sel .5, tpr 1, fpr 0
    // B: 4 rows, sel 1, pos 2, tp 0, fp 1 -> sel .25, tpr 0, fpr .5
    // overall: sel 3/8, tpr 2/4 = .5, fpr 1/4 = .25; max_sel = .5
    val df = Seq(
      ("A", 1, 1), ("A", 1, 1), ("A", 0, 0), ("A", 0, 0),
      ("B", 0, 1), ("B", 0, 1), ("B", 1, 0), ("B", 0, 0))
      .toDF("g", "p", "y")
    val r = graft.ml.Eval.fairnessReport(df, "g", col("p"), col("y"))
      .orderBy(col("group"))
      .select(col("group"), col("sel_rate"), col("tpr"), col("fpr"),
        col("parity_gap"), col("di_ratio"), col("tpr_gap"), col("fpr_gap"))
      .as[(String, Double, Double, Double, Double, Double, Double, Double)]
      .collect()
    r(0) shouldBe ("A", 0.5, 1.0, 0.0, 0.125, 1.0, 0.5, -0.25)
    r(1) shouldBe ("B", 0.25, 0.0, 0.5, -0.125, 0.5, -0.5, 0.25)
  }

  it should "fail loud on NULL pred/label rows instead of faking parity" in {
    val df = Seq(("A", Some(1), Some(1)), ("A", None, Some(0)))
      .toDF("g", "p", "y")
    val ex = intercept[Exception] {
      graft.ml.Eval.fairnessReport(df, "g", col("p"), col("y"))
        .collect()
    }
    ex.getMessage should include("NULL pred/label")
  }

  it should "pick exact conformal order statistics and NULL impossible alphas" in {
    // scores 1..9 (n = 9): alpha .2 -> k = ceil(10 * .8) = 8 ->
    // threshold 8, coverage 8/9; alpha .05 -> k = ceil(10 * .95)
    // (= 9.5000000000000018 in IEEE) = 10 > n -> NULL row
    val df = (1 to 9).map(_.toDouble).toDF("s")
    val r = graft.ml.Eval.conformalThresholds(spark, df, col("s"),
        Seq(0.05, 0.2))
      .orderBy(col("alpha"))
      .as[(Double, Long, Long, Option[Double], Option[Double])].collect()
    r(0) shouldBe (0.05, 9L, 10L, None, None)
    r(1)._3 shouldBe 8L
    r(1)._4 shouldBe Some(8.0)
    r(1)._5.get shouldBe 0.888889 +- 1e-9
  }

  it should "calibrate per group, covering each segment independently" in {
    // group a: scores 1..9; group b: scores 101..104 (too small for
    // alpha .05 -> NULL row for b, real threshold for a)
    val df = ((1 to 9).map(i => ("a", i.toDouble)) ++
      (101 to 104).map(i => ("b", i.toDouble))).toDF("g", "s")
    val r = graft.ml.Eval.groupedConformalThresholds(df, "g", col("s"),
        Seq(0.05, 0.2))
      .orderBy(col("group"), col("alpha"))
      .as[(String, Double, Long, Long, Option[Double], Option[Double])]
      .collect()
    // a, .05: k = ceil(10*.95) = 10 > 9 -> NULL
    r(0) shouldBe ("a", 0.05, 9L, 10L, None, None)
    // a, .2: k = 8 -> threshold 8.0, coverage 8/9
    r(1)._4 shouldBe 8L
    r(1)._5 shouldBe Some(8.0)
    // b, .2: n = 4, k = ceil(5*.8) = 4 -> threshold 104, coverage 1.0
    r(3)._3 shouldBe 4L
    if (r(3)._4 <= 4L) r(3)._5 shouldBe Some(104.0)
    // the marginal (pooled) cutoff at .2: k = ceil(14*.8) = 12 ->
    // threshold 103, which OVER-covers group a (9/9) and UNDER-covers
    // group b (3/4 = .75 < .8) — the miscoverage per-group calibration
    // exists to fix
    val pooled = graft.ml.Eval.conformalThresholds(spark, df, col("s"),
      Seq(0.2)).as[(Double, Long, Long, Option[Double], Option[Double])]
      .collect().head
    pooled._4 shouldBe Some(103.0)
  }

  it should "count duplicate scores into the cumulative rank" in {
    // scores: 1,2,2,3 (n = 4): alpha .2 -> k = ceil(5 * .8)
    // (= 4.000000000000001 in IEEE... check) -> threshold is the k-th
    // smallest WITH multiplicity
    val df = Seq(1.0, 2.0, 2.0, 3.0).toDF("s")
    val k = math.ceil((4 + 1.0) * (1.0 - 0.2)).toLong
    val r = graft.ml.Eval.conformalThresholds(spark, df, col("s"),
        Seq(0.2))
      .as[(Double, Long, Long, Option[Double], Option[Double])]
      .collect().head
    r._3 shouldBe k
    if (k <= 4) r._4 shouldBe Some(Seq(1.0, 2.0, 2.0, 3.0)(k.toInt - 1))
    else r._4 shouldBe None
  }
}
