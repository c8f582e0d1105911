package graft

import org.apache.spark.sql.functions._

class LabelingSpec extends SparkSpec {
  import spark.implicits._

  behavior of "ml.Labeling agreement + acquisition and ml.Matching IPW/AIPW"

  private def ann(rows: (Int, String, String)*) =
    rows.toDF("item", "rater", "label")

  it should "match the hand-computed Cohen's kappa fixture" in {
    // A: x x y y x ; B: x y y x x -> po = 3/5, marginals 3/2 both sides,
    // pe = (9 + 4)/25 = 0.52, kappa = 0.08/0.48 = 1/6
    val votes = ann(
      (1, "A", "x"), (2, "A", "x"), (3, "A", "y"), (4, "A", "y"),
      (5, "A", "x"),
      (1, "B", "x"), (2, "B", "y"), (3, "B", "y"), (4, "B", "x"),
      (5, "B", "x"))
    val r = graft.ml.Labeling
      .cohenKappa(votes, col("item"), col("rater"), col("label"), "A", "B")
      .as[(Long, Long, Double, Double, Double)].collect().head
    r._1 shouldBe 5L
    r._2 shouldBe 3L
    r._3 shouldBe 0.6 +- 1e-9
    r._4 shouldBe 0.52 +- 1e-9
    r._5 shouldBe 0.166667 +- 1e-9 // 1/6 quantized-6
  }

  it should "NULL kappa when both raters are constant and drop unpaired items" in {
    val votes = ann((1, "A", "x"), (2, "A", "x"), (1, "B", "x"),
      (2, "B", "x"), (9, "A", "y")) // item 9 unpaired -> excluded
    val r = graft.ml.Labeling
      .cohenKappa(votes, col("item"), col("rater"), col("label"), "A", "B")
      .select(col("n_items"), col("po"), col("kappa"))
      .as[(Long, Double, Option[Double])].collect().head
    r._1 shouldBe 2L
    r._2 shouldBe 1.0 +- 1e-9
    r._3 shouldBe None
  }

  it should "fail loud on duplicate (item, rater) votes" in {
    val votes = ann((1, "A", "x"), (1, "A", "y"), (1, "B", "x"))
    val ex = intercept[IllegalArgumentException] {
      graft.ml.Labeling.cohenKappa(votes, col("item"), col("rater"),
        col("label"), "A", "B")
    }
    ex.getMessage should include("votes")
  }

  it should "agree with cohenKappa on every pair of a 3-rater panel" in {
    val votes = (1 to 30).flatMap { i =>
      Seq((i, "A", s"l${i % 3}"), (i, "B", s"l${(i + 1) % 3}"),
        (i, "C", s"l${(i * 2) % 3}"))
    }
    val df = votes.toDF("item", "rater", "label")
    val matrix = graft.ml.Labeling.pairwiseKappa(df, col("item"),
        col("rater"), col("label"))
      .orderBy(col("rater_a"), col("rater_b"))
      .as[(String, String, Long, Long, Double, Double, Option[Double])]
      .collect()
    matrix.map(m => (m._1, m._2)).toSeq shouldBe
      Seq(("A", "B"), ("A", "C"), ("B", "C"))
    for ((ra, rb) <- Seq(("A", "B"), ("A", "C"), ("B", "C"))) {
      val single = graft.ml.Labeling.cohenKappa(df, col("item"),
          col("rater"), col("label"), ra, rb)
        .as[(Long, Long, Double, Double, Double)].collect().head
      val m = matrix.find(x => x._1 == ra && x._2 == rb).get
      (m._3, m._4, m._5, m._6, m._7.get) shouldBe single
    }
  }

  it should "orient pairs once and handle a rater missing some items" in {
    val votes = Seq((1, "A", "x"), (1, "B", "x"), (2, "A", "y"),
      (2, "B", "x"), (3, "A", "x")) // C absent; item 3 has no pair
    val r = graft.ml.Labeling.pairwiseKappa(
        votes.toDF("item", "rater", "label"),
        col("item"), col("rater"), col("label"))
      .as[(String, String, Long, Long, Double, Double, Option[Double])]
      .collect()
    r.length shouldBe 1
    r.head._3 shouldBe 2L // only paired items count
    r.head._4 shouldBe 1L
  }

  it should "build the hand-computed confident joint with threshold gating" in {
    // classes x/y over 4 docs; given labels: d1,d2 -> x; d3,d4 -> y
    // p_x: d1 .9, d2 .8, d3 .3, d4 .1 ; p_y = 1 - p_x
    // t_x = mean(.9,.8) = .85 ; t_y = mean(.7,.9) = .8
    // d1: x qualifies (.9>=.85), y(.1) no  -> (x, x)
    // d2: x(.8) no, y(.2) no               -> (x, NULL) unconfident
    // d3: y(.7) no, x(.3) no               -> (y, NULL) unconfident
    // d4: y(.9) >= .8                      -> (y, y)
    val scores = Seq(
      (1L, "x", "x", 0.9), (1L, "x", "y", 0.1),
      (2L, "x", "x", 0.8), (2L, "x", "y", 0.2),
      (3L, "y", "x", 0.3), (3L, "y", "y", 0.7),
      (4L, "y", "x", 0.1), (4L, "y", "y", 0.9))
      .toDF("id", "given", "cl", "p")
    val r = graft.ml.Labeling.confidentJoint(scores, col("id"),
        col("given"), col("cl"), col("p"))
      .orderBy(col("given"), col("suggested"))
      .as[(String, Option[String], Long, Double)].collect()
    r.toSeq shouldBe Seq(
      ("x", None, 1L, 0.5), ("x", Some("x"), 1L, 0.5),
      ("y", None, 1L, 0.5), ("y", Some("y"), 1L, 0.5))
  }

  it should "flag planted systematic noise as off-diagonal mass" in {
    // 30 docs labeled 'a' but 10 of them carry p_b = 1.0 (mislabeled);
    // all clean docs are confident in their own class
    val rows = (1 to 30).flatMap { i =>
      val noisy = i % 3 == 0
      Seq((i.toLong, "a", "a", if (noisy) 0.0 else 1.0),
        (i.toLong, "a", "b", if (noisy) 1.0 else 0.0))
    } ++ (31 to 40).flatMap(i =>
      Seq((i.toLong, "b", "a", 0.0), (i.toLong, "b", "b", 1.0)))
    val r = graft.ml.Labeling.confidentJoint(rows.toDF("id", "given", "cl", "p"),
        col("id"), col("given"), col("cl"), col("p"))
      .filter(col("given") === "a" && col("suggested") === "b")
      .select(col("n")).as[Long].collect()
    r.headOption shouldBe Some(10L)
  }

  it should "match the hand-computed Fleiss' kappa fixture" in {
    // 4 items x 3 raters: S2 = 26, cj = (6, 5, 1) -> Se = 62
    // P-bar = 14/24, Pe = 62/144, kappa = 0.268293 (quantized-6)
    val votes = ann(
      (1, "A", "a"), (1, "B", "a"), (1, "C", "a"),
      (2, "A", "a"), (2, "B", "a"), (2, "C", "b"),
      (3, "A", "b"), (3, "B", "b"), (3, "C", "b"),
      (4, "A", "a"), (4, "B", "b"), (4, "C", "c"))
    val r = graft.ml.Labeling
      .fleissKappa(votes, col("item"), col("rater"), col("label"))
      .as[(Long, Long, Double, Double, Double)].collect().head
    r._1 shouldBe 4L
    r._2 shouldBe 3L
    r._3 shouldBe 0.583333 +- 1e-9
    r._4 shouldBe 0.430556 +- 1e-9
    r._5 shouldBe 0.268293 +- 1e-9
  }

  it should "fail loud when the rater panel size varies across items" in {
    val votes = ann((1, "A", "a"), (1, "B", "a"), (2, "A", "a"))
    val ex = intercept[IllegalArgumentException] {
      graft.ml.Labeling.fleissKappa(votes, col("item"), col("rater"),
        col("label"))
    }
    ex.getMessage should include("panel")
  }

  it should "aggregate majority votes with explicit ties" in {
    val votes = ann(
      (1, "A", "x"), (1, "B", "x"), (1, "C", "y"),
      (2, "A", "x"), (2, "B", "y"), (2, "C", "z"))
    val r = graft.ml.Labeling
      .majorityVote(votes, col("item"), col("rater"), col("label"))
      .orderBy(col("item"))
      .as[(Int, Long, Long, Option[String], Boolean, Double)]
      .collect()
    r(0) shouldBe ((1, 3L, 2L, Some("x"), false, 0.666667))
    r(1)._4 shouldBe None // 1-1-1 tie -> no consensus
    r(1)._5 shouldBe true
    r(1)._6 shouldBe 0.333333 +- 1e-9
  }

  it should "compute entropy and margin uncertainty scores" in {
    val scores = Seq(
      ("i1", "a", 0.5), ("i1", "b", 0.5),
      ("i2", "a", 0.9), ("i2", "b", 0.1),
      ("i3", "a", 0.6), ("i3", "b", 0.4))
      .toDF("item", "cl", "p")
    val r = graft.ml.Labeling
      .uncertaintyScores(scores, col("item"), col("p"))
      .orderBy(col("item"))
      .as[(String, Double, Double)].collect()
    r(0)._2 shouldBe math.log(2.0) +- 1e-6
    r(0)._3 shouldBe 0.0 +- 1e-12 // tied top -> zero margin
    r(1)._2 shouldBe 0.325083 +- 1e-6
    r(1)._3 shouldBe 0.8 +- 1e-9
    r(2)._2 shouldBe 0.673012 +- 1e-6
    r(2)._3 shouldBe 0.2 +- 1e-9
  }

  it should "pick acquisition batches by entropy desc and margin asc" in {
    val scores = Seq(
      ("i1", "a", 0.5), ("i1", "b", 0.5),
      ("i2", "a", 0.9), ("i2", "b", 0.1),
      ("i3", "a", 0.6), ("i3", "b", 0.4))
      .toDF("item", "cl", "p")
    val byEntropy = graft.ml.Labeling
      .uncertaintySample(scores, col("item"), col("p"), k = 2)
      .select(col("item"), col("pick_rank"))
      .as[(String, Int)].collect()
    byEntropy.toSeq shouldBe Seq(("i1", 1), ("i3", 2))
    val byMargin = graft.ml.Labeling
      .uncertaintySample(scores, col("item"), col("p"), k = 2,
        method = "margin")
      .select(col("item"), col("pick_rank"))
      .as[(String, Int)].collect()
    byMargin.toSeq shouldBe Seq(("i1", 1), ("i3", 2))
  }

  it should "match the hand-computed Hajek IPW fixture" in {
    // treated: (10, e=.5)->w 2, (20, e=.8)->w 1.25 ; mu1 = 45/3.25
    // control: (5, e=.5)->w 2, (8, e=.2)->w 1.25 ; mu0 = 20/3.25
    val df = Seq(
      (10.0, 1, 0.5), (20.0, 1, 0.8), (5.0, 0, 0.5), (8.0, 0, 0.2))
      .toDF("y", "t", "e")
    val r = graft.ml.Matching.ipwAte(df, col("y"), col("t"), col("e"))
      .as[(Long, Long, Double, Double, Double)].collect().head
    r._1 shouldBe 4L
    r._2 shouldBe 2L
    r._3 shouldBe 45.0 / 3.25 +- 1e-6
    r._4 shouldBe 20.0 / 3.25 +- 1e-6
    r._5 shouldBe 25.0 / 3.25 +- 1e-6
  }

  it should "fail loud on out-of-(0,1) or NULL propensities" in {
    val bad = Seq((1.0, 1, 1.0), (2.0, 0, 0.5)).toDF("y", "t", "e")
    intercept[IllegalArgumentException] {
      graft.ml.Matching.ipwAte(bad, col("y"), col("t"), col("e"))
    }.getMessage should include("(0,1)")
    val withNull = Seq((Some(1.0), 1, Some(0.5)), (Some(2.0), 0, None))
      .toDF("y", "t", "e")
    intercept[IllegalArgumentException] {
      graft.ml.Matching.ipwAte(withNull, col("y"), col("t"), col("e"))
    }.getMessage should include("NULL")
  }

  it should "match the hand-computed AIPW fixture" in {
    // terms: treated 5 + (10-8)/.5 = 9 ; control 5 - (4-3)/.5 = 3
    val df = Seq(
      (10.0, 1, 0.5, 8.0, 3.0), (4.0, 0, 0.5, 8.0, 3.0))
      .toDF("y", "t", "e", "m1", "m0")
    val r = graft.ml.Matching.aipwAte(df, col("y"), col("t"), col("e"),
      col("m1"), col("m0"))
      .as[(Long, Long, Double, Double)].collect().head
    r._1 shouldBe 2L
    r._2 shouldBe 1L
    r._3 shouldBe 5.0 +- 1e-9
    r._4 shouldBe 6.0 +- 1e-9
  }
}
