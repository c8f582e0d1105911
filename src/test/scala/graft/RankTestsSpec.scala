package graft

import org.apache.spark.sql.functions._

class RankTestsSpec extends SparkSpec {
  import spark.implicits._

  behavior of "ml.RankTests"

  it should "score a perfect monotone relationship rho = 1" in {
    val df = (1 to 20).map(i => ("a", i.toDouble, math.exp(i / 3.0)))
      .toDF("g", "x", "y")
    val r = graft.ml.RankTests.spearman(df, col("g"), col("x"), col("y"))
      .as[(String, Long, Option[Double])].collect()
    r.head._2 shouldBe 20L
    r.head._3.get shouldBe 1.0 +- 1e-12
  }

  it should "match the midrank Spearman fixture under ties" in {
    // scipy.stats.spearmanr-equivalent hand fixture: rho = 0.9256265…
    val xs = Seq(1, 2, 2, 3, 4, 4, 4, 5).map(_.toDouble)
    val ys = Seq(2.0, 1.0, 3.0, 3.0, 5.0, 4.0, 4.0, 6.0)
    val df = xs.zip(ys).map { case (x, y) => ("g", x, y) }
      .toDF("g", "x", "y")
    val r = graft.ml.RankTests.spearman(df, col("g"), col("x"), col("y"))
      .as[(String, Long, Option[Double])].collect()
    r.head._3.get shouldBe 0.925627 +- 1e-9 // quantized-6
  }

  it should "emit NULL rho for a constant side and survive repartitioning" in {
    val df = (1 to 10).map(i => ("a", i.toDouble, 7.0)).toDF("g", "x", "y")
    graft.ml.RankTests.spearman(df, col("g"), col("x"), col("y"))
      .as[(String, Long, Option[Double])].collect().head._3 shouldBe None
    val big = (1 to 200).map(i => ("a", (i % 13).toDouble,
      ((i * 7) % 11).toDouble)).toDF("g", "x", "y")
    val one = graft.ml.RankTests
      .spearman(big.coalesce(1), col("g"), col("x"), col("y"))
      .as[(String, Long, Option[Double])].collect().head
    val many = graft.ml.RankTests
      .spearman(big.repartition(17), col("g"), col("x"), col("y"))
      .as[(String, Long, Option[Double])].collect().head
    one shouldBe many
  }

  it should "match the Kruskal-Wallis tie-corrected fixture" in {
    // groups a:[1..4] b:[3..7] c:[6..8] -> H = 7.2564103, C = 0.986014
    val rows = Seq(1, 2, 3, 4).map(("a", _)) ++
      Seq(3, 4, 5, 6, 7).map(("b", _)) ++ Seq(6, 7, 8).map(("c", _))
    val df = rows.map { case (g, v) => (g, v.toDouble) }.toDF("g", "v")
    val r = graft.ml.RankTests.kruskalWallis(df, col("g"), col("v"))
      .as[(Long, Long, Long, Option[Double], Option[Double],
        Option[Double])].collect().head
    r._1 shouldBe 12L
    r._2 shouldBe 3L
    r._3 shouldBe 2L
    r._4.get shouldBe 7.256410 +- 1e-9
    r._5.get shouldBe 0.986014 +- 1e-9
    r._6.get shouldBe 7.359338 +- 1e-9
  }

  it should "match the Mann-Whitney tie-corrected fixture" in {
    // arm0 [1..5], arm1 [3..8]: U1 = 25.5, z = 1.930235, p = 0.053578
    val rows = Seq(1, 2, 3, 4, 5).map((0, _)) ++
      Seq(3, 4, 5, 6, 7, 8).map((1, _))
    val df = rows.map { case (a, v) => (a, v.toDouble) }.toDF("arm", "v")
    val r = graft.ml.RankTests.mannWhitney(df, col("arm"), col("v"))
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().head
    r._1 shouldBe 5L
    r._2 shouldBe 6L
    r._3.get shouldBe 25.5
    r._4.get shouldBe 4.5
    r._5.get shouldBe 1.930235 +- 1e-9
    r._6.get shouldBe 0.053578 +- 1e-9
  }

  it should "degrade to NULL z when every value is tied" in {
    val df = (1 to 8).map(i => (i % 2, 5.0)).toDF("arm", "v")
    val r = graft.ml.RankTests.mannWhitney(df, col("arm"), col("v"))
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().head
    r._5 shouldBe None
    r._6 shouldBe None
  }

  behavior of "RankTests.jonckheereTerpstra (F78)"

  it should "reproduce the hand-computed doubled statistic and z" in {
    // groups 0:(1,2), 1:(2,3), 2:(4,5): 2U_01 = 7 (one tie at 2),
    // 2U_02 = 8, 2U_12 = 8 -> J2 = 23? no: U01=3.5 (1<2,1<3,2=2 half,
    // 2<3) -> 2U01 = 7; U02 = 4 -> 8; U12 = 4 -> 8; J2 = 23 + ... =
    // 7 + 8 + 8 = 23. E2 = (36 - 12)/2 = 12;
    // V = (36*15 - 3*4*7)/72 = 456/72
    val df = Seq((0, 1.0), (0, 2.0), (1, 2.0), (1, 3.0), (2, 4.0),
      (2, 5.0)).toDF("g", "v")
    val r = graft.ml.RankTests.jonckheereTerpstra(df, col("g"),
        col("v"))
      .as[(Long, Long, Long, Double)].collect().head
    r._1 shouldBe 6L; r._2 shouldBe 3L
    r._3 shouldBe 23L
    val v = 456.0 / 72.0
    val z = (23.0 - 12.0) / (2.0 * math.sqrt(v))
    r._4 shouldBe math.floor(z * 1e6 + 0.5) / 1e6
  }

  it should "score a clean monotone trend higher than a shuffled one and stay partition-invariant" in {
    val trend = (1 to 90).map(i => (i % 3, (i % 3) * 100.0 + i % 7))
      .toDF("g", "v")
    val flat = (1 to 90).map(i => (i % 3, (i * 13 % 17).toDouble))
      .toDF("g", "v")
    def z(df: org.apache.spark.sql.DataFrame) =
      graft.ml.RankTests.jonckheereTerpstra(df, col("g"), col("v"))
        .select(col("z")).as[Double].collect().head
    z(trend) should be > z(flat)
    z(trend.repartition(7)) shouldBe z(trend)
    an[IllegalArgumentException] should be thrownBy
      graft.ml.RankTests.jonckheereTerpstra(
        (1 to 40).map(i => (i, i.toDouble)).toDF("g", "v"),
        col("g"), col("v"), maxGroups = 8)
    graft.util.Caches.releaseAll(spark)
  }

  it should "fail loud on fractional or non-numeric group labels" in {
    // 0.2 and 0.9 would both truncate to level 0, silently merging
    // groups; a non-numeric label casts to NULL and NPE'd pre-guard
    an[Exception] should be thrownBy
      graft.ml.RankTests.jonckheereTerpstra(
        Seq((0.2, 1.0), (0.9, 2.0), (1.0, 3.0), (2.0, 4.0))
          .toDF("g", "v"), col("g"), col("v"))
        .collect()
    an[Exception] should be thrownBy
      graft.ml.RankTests.jonckheereTerpstra(
        Seq(("lo", 1.0), ("mid", 2.0), ("hi", 3.0)).toDF("g", "v"),
        col("g"), col("v"))
        .collect()
    // exact integer levels carried as strings or doubles still work
    val z = graft.ml.RankTests.jonckheereTerpstra(
      Seq(("0", 1.0), ("0", 2.0), ("1", 3.0), ("1", 4.0),
        ("2", 5.0), ("2", 6.0)).toDF("g", "v"), col("g"), col("v"))
      .select(col("z")).as[Double].collect().head
    z should be > 0.0
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "ml.RankTests.friedman"

  it should "match the classic no-tie fixture and the Conover tie form" in {
    // 4 blocks x 3 treatments, no ties: classic
    // chi2 = 12/(nk(k+1))*sum(Rj^2) - 3n(k+1) = 3.5
    val noTie = Seq(
      (1, "a", 1.0), (1, "b", 2.0), (1, "c", 3.0),
      (2, "a", 2.0), (2, "b", 3.0), (2, "c", 1.0),
      (3, "a", 1.0), (3, "b", 3.0), (3, "c", 2.0),
      (4, "a", 1.0), (4, "b", 2.0), (4, "c", 3.0))
      .toDF("b", "t", "v")
    val r = graft.ml.RankTests.friedman(noTie, col("b"), col("t"),
      col("v"))
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().head
    r shouldBe ((4L, 3L, 2L, Some(3.5), Some(0.4375)))
    // Kendall's W = chi2/(n(k-1)) = 3.5/8 = 0.4375 exactly
    // within-block ties use midranks (hand: chi2 = 1.0)
    val tied = Seq(
      (1, "a", 1.0), (1, "b", 1.0), (1, "c", 2.0),
      (2, "a", 3.0), (2, "b", 1.0), (2, "c", 1.0),
      (3, "a", 2.0), (3, "b", 2.0), (3, "c", 2.0))
      .toDF("b", "t", "v")
    graft.ml.RankTests.friedman(tied, col("b"), col("t"), col("v"))
      .as[(Long, Long, Long, Option[Double], Option[Double])].collect()
      .head._4.get shouldBe 1.0 +- 1e-12
    // perfect concordance: every block ranks a<b<c -> W = 1 exactly
    val perfect = (1 to 5).flatMap(b => Seq(
      (b, "a", 1.0), (b, "b", 2.0), (b, "c", 3.0))).toDF("b", "t", "v")
    graft.ml.RankTests.friedman(perfect, col("b"), col("t"), col("v"))
      .as[(Long, Long, Long, Option[Double], Option[Double])].collect()
      .head._5.get shouldBe 1.0 +- 1e-12
    // every block all-tied -> denominator 0 -> NULL chi2/W
    val flat = (1 to 3).flatMap(b =>
      Seq("a", "b", "c").map(t => (b, t, 5.0))).toDF("b", "t", "v")
    val fr = graft.ml.RankTests.friedman(flat, col("b"), col("t"),
      col("v"))
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().head
    fr._4 shouldBe None
    fr._5 shouldBe None
  }

  it should "fail loud on duplicate observations and incomplete blocks" in {
    val dup = Seq((1, "a", 1.0), (1, "a", 2.0), (1, "b", 3.0),
      (2, "a", 1.0), (2, "b", 2.0)).toDF("b", "t", "v")
    an[Exception] should be thrownBy
      graft.ml.RankTests.friedman(dup, col("b"), col("t"), col("v"))
        .collect()
    val incomplete = Seq((1, "a", 1.0), (1, "b", 2.0),
      (2, "a", 1.0)).toDF("b", "t", "v")
    an[Exception] should be thrownBy
      graft.ml.RankTests.friedman(incomplete, col("b"), col("t"),
        col("v")).collect()
    an[Exception] should be thrownBy
      graft.ml.RankTests.friedman(
        Seq((Some(1), Some("a"), None: Option[Double]))
          .toDF("b", "t", "v"), col("b"), col("t"), col("v")).collect()
  }

  it should "stay partition-invariant on Friedman" in {
    val rows = (1 to 40).flatMap(b => Seq("a", "b", "c", "d").map(t =>
      (b, t, ((b * 7 + t.hashCode.abs) % 13).toDouble)))
    val df = rows.toDF("b", "t", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ml.RankTests.friedman(d, col("b"), col("t"), col("v"))
        .as[(Long, Long, Long, Option[Double], Option[Double])]
        .collect().head
    run(df.coalesce(1)) shouldBe run(df.repartition(17))
  }

  behavior of "ml.RankTests.kendallTau"

  it should "match the hand tau-b fixture with ties on both sides" in {
    // x=[1,2,2,3,4] y=[2,1,3,3,5]: C-D=6, tau-b=2/3
    val df = Seq((1.0, 2.0), (2.0, 1.0), (2.0, 3.0), (3.0, 3.0),
      (4.0, 5.0)).map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val r = graft.ml.RankTests.kendallTau(df, col("g"), col("x"),
      col("y")).as[(String, Long, Long, Long, Option[Double])]
      .collect().head
    r._2 shouldBe 5L
    r._4 shouldBe 6L
    r._5.get shouldBe 0.666667 +- 1e-9 // q6 of 2/3
    // perfect monotone -> exactly 1
    val mono = (1 to 8).map(i => ("g", i.toDouble, (i * 3).toDouble))
      .toDF("g", "x", "y")
    graft.ml.RankTests.kendallTau(mono, col("g"), col("x"), col("y"))
      .as[(String, Long, Long, Long, Option[Double])].collect()
      .head._5.get shouldBe 1.0 +- 1e-12
    graft.util.Caches.releaseAll(spark)
  }

  it should "emit NULL tau for a constant side, fail loud past the cell cap, and stay partition-invariant" in {
    val const = (1 to 10).map(i => ("g", i.toDouble, 3.0))
      .toDF("g", "x", "y")
    graft.ml.RankTests.kendallTau(const, col("g"), col("x"), col("y"))
      .as[(String, Long, Long, Long, Option[Double])].collect()
      .head._5 shouldBe None
    an[Exception] should be thrownBy
      graft.ml.RankTests.kendallTau(
        (1 to 50).map(i => ("g", i.toDouble, (i * 2).toDouble))
          .toDF("g", "x", "y"),
        col("g"), col("x"), col("y"), maxCellsPerGroup = 10).collect()
    val big = (1 to 300).map(i =>
      (s"g${i % 2}", (i % 9).toDouble, ((i * 5) % 7).toDouble))
      .toDF("g", "x", "y")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ml.RankTests.kendallTau(d, col("g"), col("x"), col("y"))
        .orderBy(col("g"))
        .as[(String, Long, Long, Long, Option[Double])].collect().toSeq
    run(big.coalesce(1)) shouldBe run(big.repartition(13))
    graft.util.Caches.releaseAll(spark)
  }
}
