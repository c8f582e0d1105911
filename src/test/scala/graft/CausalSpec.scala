package graft

import org.apache.spark.sql.functions._

class CausalSpec extends SparkSpec {
  import spark.implicits._

  behavior of "dq.Stats causal/AB extensions and ml.Matching"

  it should "match the hand-computed one-way ANOVA fixture" in {
    // a=[1,2,3] b=[2,4,6] c=[10..13]: SSB=179.4 SSW=15 F=41.86
    val rows = Seq(1, 2, 3).map(("a", _)) ++ Seq(2, 4, 6).map(("b", _)) ++
      Seq(10, 11, 12, 13).map(("c", _))
    val df = rows.map { case (g, v) => (g, v.toDouble) }.toDF("g", "v")
    val r = graft.dq.Stats.oneWayAnova(df, col("g"), col("v"))
      .as[(Long, Long, Double, Double, Option[Double], Option[Double])]
      .collect().head
    r._1 shouldBe 10L
    r._2 shouldBe 3L
    r._3 shouldBe 179.4 +- 1e-9
    r._4 shouldBe 15.0 +- 1e-9
    r._5.get shouldBe 41.86 +- 1e-9
    r._6.get shouldBe 0.92284 +- 1e-9
  }

  it should "emit NULL f for a single group and for zero within-variance" in {
    val one = (1 to 5).map(i => ("a", i.toDouble)).toDF("g", "v")
    graft.dq.Stats.oneWayAnova(one, col("g"), col("v"))
      .select(col("f_stat")).as[Option[Double]].collect()
      .head shouldBe None
    val sep = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0))
      .toDF("g", "v")
    graft.dq.Stats.oneWayAnova(sep, col("g"), col("v"))
      .select(col("f_stat")).as[Option[Double]].collect()
      .head shouldBe None // SSW = 0: F undefined, not infinite
  }

  it should "match the mSPRT closed-form fixture and stay 1 under no effect" in {
    val counts = Seq(("seg", 1000L, 1000L, 100L, 130L))
      .toDF("seg", "n0", "n1", "c0", "c1")
    val r = graft.dq.Stats.msprtFromCounts(counts, Seq("seg"))
      .as[(String, Long, Long, Long, Long, Option[Double],
        Option[Double], Option[Double], Option[Double])].collect().head
    r._6.get shouldBe 0.03 +- 1e-9
    r._7.get shouldBe 0.00020355 +- 1e-9
    r._8.get shouldBe 1.696359 +- 1e-9
    r._9.get shouldBe 0.589498 +- 1e-9
    // identical rates: delta = 0 -> Lambda < 1 -> p_av clamps to 1
    val nul = Seq(("seg", 1000L, 1000L, 100L, 100L))
      .toDF("seg", "n0", "n1", "c0", "c1")
    graft.dq.Stats.msprtFromCounts(nul, Seq("seg"))
      .select(col("p_av")).as[Option[Double]].collect()
      .head.get shouldBe 1.0
  }

  it should "match each treated unit to its nearest in-caliper control" in {
    val treated = Seq((1L, 0.10, 5.0), (2L, 0.50, 7.0), (3L, 0.90, 9.0))
      .toDF("id", "score", "y")
    val control = Seq((10L, 0.08, 4.0), (11L, 0.13, 6.0),
      (12L, 0.52, 1.0), (13L, 0.48, 3.0), (14L, 0.70, 2.0))
      .toDF("id", "score", "y")
    val m = graft.ml.Matching.caliperMatch(treated, control, 0.05)
      .orderBy(col("t_id"))
      .as[(Long, Double, Double, Long, Double, Double, Double)]
      .collect()
    // t=1: 10 at .02, 11 at .03 -> 10; t=2: 12 and 13 both at .02 ->
    // lower c_score wins (13); t=3: nothing within .05 -> unmatched
    m.map(_._1) shouldBe Array(1L, 2L)
    m(0)._4 shouldBe 10L
    m(1)._4 shouldBe 13L
    val att = graft.ml.Matching.att(
      graft.ml.Matching.caliperMatch(treated, control, 0.05), 3L)
      .as[(Long, Long, Double, Option[Double])].collect().head
    att._1 shouldBe 3L
    att._2 shouldBe 2L
    att._3 shouldBe 0.666667 +- 1e-9
    // (5-4) + (7-3) = 5 over 2 matches
    att._4.get shouldBe 2.5 +- 1e-9
  }

  it should "include pairs exactly at the caliper boundary across bins" in {
    val treated = Seq((1L, 0.100, 1.0)).toDF("id", "score", "y")
    val control = Seq((2L, 0.150, 2.0)).toDF("id", "score", "y")
    val m = graft.ml.Matching.caliperMatch(treated, control, 0.05)
      .collect()
    m.length shouldBe 1
  }
}
