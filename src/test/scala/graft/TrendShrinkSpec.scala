package graft

import org.apache.spark.sql.functions._

class TrendShrinkSpec extends SparkSpec {
  import spark.implicits._

  behavior of "dq.Stats.cochranArmitage / ebShrinkRates, ml.Eval.brierDecomposition"

  it should "match the hand-computed Cochran-Armitage trend fixture" in {
    // doses 1/2/3, rates 0.1/0.3/0.6 over n=10 each: T=5, Var=4.444
    val rows = (1 to 3).flatMap { w =>
      (1 to 10).map(i => (w, if (i <= Seq(1, 3, 6)(w - 1)) 1 else 0))
    }
    val df = rows.toDF("dose", "conv")
    val r = graft.dq.Stats.cochranArmitage(df, col("dose"), col("conv"))
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().head
    r._1 shouldBe 30L
    r._2 shouldBe 3L
    r._3.get shouldBe 5.0 +- 1e-9
    r._4.get shouldBe 4.444444 +- 1e-9
    r._5.get shouldBe 2.371708 +- 1e-9
    r._6.get shouldBe 0.017706 +- 1e-9
  }

  it should "emit NULL z for an all-converted board (no sampling variance)" in {
    val df = (1 to 3).flatMap(w => (1 to 5).map(_ => (w, 1)))
      .toDF("dose", "conv")
    val r = graft.dq.Stats.cochranArmitage(df, col("dose"), col("conv"))
      .select(col("z"), col("p")).as[(Option[Double], Option[Double])]
      .collect().head
    r._1 shouldBe None
    r._2 shouldBe None
  }

  it should "shrink extreme small-n rates toward the fitted beta prior" in {
    // groups at rates .2/.4/.6: MoM prior Beta(3.2, 4.8)
    val rows = Seq(("a", 10, 2), ("b", 10, 4), ("c", 10, 6)).flatMap {
      case (g, n, c) => (1 to n).map(i => (g, if (i <= c) 1 else 0))
    }
    val df = rows.toDF("g", "conv")
    val r = graft.dq.Stats.ebShrinkRates(df, col("g"), col("conv"))
      .orderBy(col("g"))
      .as[(String, Long, Long, Double, Option[Double], Option[Double],
        Double)].collect()
    r.map(_._5.get).foreach(_ shouldBe 3.2 +- 1e-6)
    r.map(_._6.get).foreach(_ shouldBe 4.8 +- 1e-6)
    r.map(_._7) shouldBe Array(0.288889, 0.4, 0.511111)
    // shrinkage is toward the mean: low rates rise, high rates fall
    r(0)._7 should be > r(0)._4
    r(2)._7 should be < r(2)._4
  }

  it should "fall back to raw rates when the MoM prior is undefined" in {
    // identical rates: v = 0 -> no prior, raw rates pass through
    val rows = Seq(("a", 1), ("a", 0), ("b", 1), ("b", 0))
      .toDF("g", "conv")
    val r = graft.dq.Stats.ebShrinkRates(rows, col("g"), col("conv"))
      .orderBy(col("g"))
      .as[(String, Long, Long, Double, Option[Double], Option[Double],
        Double)].collect()
    r.foreach { row =>
      row._5 shouldBe None
      row._7 shouldBe row._4
    }
  }

  it should "match the hand-computed Murphy decomposition and report the residual" in {
    val data = Seq((0.1, 0), (0.2, 0), (0.3, 1), (0.8, 1), (0.9, 1),
      (0.7, 0)).toDF("score", "y")
      .select(col("score"), (col("y") === 1).as("ok"))
    val r = graft.ml.Eval.brierDecomposition(spark, data, "score", "ok",
      nBuckets = 2)
      .as[(Long, Long, Double, Double, Double, Double, Double)]
      .collect().head
    r._1 shouldBe 6L
    r._2 shouldBe 2L
    r._3 shouldBe 0.18 +- 1e-9      // brier
    r._4 shouldBe 0.017778 +- 1e-9  // reliability
    r._5 shouldBe 0.027778 +- 1e-9  // resolution
    r._6 shouldBe 0.25 +- 1e-9      // uncertainty
    r._7 shouldBe -0.06 +- 1e-9     // within-bucket variance, reported
    graft.util.Caches.releaseAll(spark)
  }
}
