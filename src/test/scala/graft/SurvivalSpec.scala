package graft

import org.apache.spark.sql.functions._

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  behavior of "events.Resample survival extensions"

  it should "match the hand-computed Nelson-Aalen curve" in {
    // u1 gaps {1,2} censored 2; u2 gaps {1,3,5} censored 4 at Feb 1 —
    // spans (1,F)(1,F)(2,F)(2,T)(3,F)(4,T)(5,F)
    val ev = Seq(
      ("u1", "2024-01-27"), ("u1", "2024-01-28"), ("u1", "2024-01-30"),
      ("u2", "2024-01-19"), ("u2", "2024-01-20"), ("u2", "2024-01-23"),
      ("u2", "2024-01-28")).toDF("user_id", "d")
      .select(col("user_id"), col("d").cast("timestamp").as("ts"))
    val r = graft.events.Resample
      .nelsonAalen(ev, "user_id", col("ts"), "2024-02-01")
      .orderBy(col("duration_days"))
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    r.map(x => (x._1, x._2, x._3, x._4)) shouldBe Array(
      (1L, 7L, 2L, 0L), (2L, 5L, 1L, 1L), (3L, 3L, 1L, 0L),
      (4L, 2L, 0L, 1L), (5L, 1L, 1L, 0L))
    r.map(_._5) shouldBe Array(0.285714, 0.485714, 0.819048, 0.819048,
      1.819048)
    r.map(_._6) shouldBe Array(0.040816327, 0.080816327, 0.191927438,
      0.191927438, 1.191927438)
  }

  it should "match the hand-computed two-group log-rank fixture" in {
    val spans = Seq((1, 2L, false), (1, 3L, false), (1, 5L, true),
      (1, 6L, false), (0, 1L, false), (0, 2L, false), (0, 4L, true),
      (0, 6L, false), (0, 7L, true))
      .toDF("grp", "t", "__censored")
    val r = graft.events.Resample.logRankFromSpans(spans)
      .as[(Long, Long, Long, Long, Double, Double, Option[Double],
        Option[Double], Option[Double])].collect().head
    r._1 shouldBe 5L // n0
    r._2 shouldBe 4L // n1
    r._3 shouldBe 4L // event times
    r._4 shouldBe 3L // observed arm-1 events
    r._5 shouldBe 2.611111
    r._6 shouldBe 1.147707
    r._7.get shouldBe 0.363003 +- 1e-9
    r._8.get shouldBe 0.131771 +- 1e-9
    r._9.get shouldBe 0.716603 +- 1e-9
  }

  it should "emit NULL z when one arm never experiences an event" in {
    val spans = Seq((1, 3L, true), (1, 4L, true), (0, 1L, false),
      (0, 2L, false)).toDF("grp", "t", "__censored")
    // all events happen where one arm has already left the risk set
    // only via censoring; V can still be > 0 — force the degenerate
    // case with a single span per arm at the same time
    val deg = Seq((1, 2L, false), (0, 2L, false))
      .toDF("grp", "t", "__censored")
    val r = graft.events.Resample.logRankFromSpans(deg)
      .select(col("z"), col("p")).as[(Option[Double], Option[Double])]
      .collect().head
    // n_j = 2, d_j = 2 -> V = d(n-d)... = 0: degenerate, NULL z/p
    r._1 shouldBe None
    r._2 shouldBe None
    graft.events.Resample.logRankFromSpans(spans)
      .select(col("o1")).as[Long].collect().head shouldBe 0L
  }
}
