package graft

import org.apache.spark.sql.functions._

class PettittSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  behavior of "Resample.pettittChangepoint (E36)"

  it should "reproduce the hand-computed doubled U sequence with ties" in {
    // daily x = (1,1,1,1,9,9,9,9): 2r = 5 for the 1s (rank 1, 4 ties),
    // 13 for the 9s; U_t = 2R_t - 9t = (-4,-8,-12,-16,-12,-8,-4,0)
    // -> K = 16 at day 4 (U_t = sgn-pair sum: 4*4 pairs all negative)
    val rows = (1 to 8).map { d =>
      (7L, ts(f"2024-03-$d%02d 10:00:00"), if (d <= 4) 1.0 else 9.0)
    }.toDF("user_id", "t", "v")
    val r = graft.events.Resample.pettittChangepoint(rows, "user_id",
        col("t"), col("v"))
      .as[(Long, Long, Long, String, Double, Int)].collect().head
    r._2 shouldBe 8L
    r._3 shouldBe 16L
    r._4 shouldBe "2024-03-04"
    val p = math.min(2.0 * math.exp(-6.0 * 256.0 / (512.0 + 64.0)), 1.0)
    r._5 shouldBe q6(p)
    r._6 shouldBe (if (p < 0.05) 1 else 0)
  }

  it should "clamp p to 1 on an alternating series and break |U| ties by the earliest day" in {
    // x = (1,2,1,2): 2r = (3,7,3,7), U_t = 2R_t - 5t = (-2,0,-2,0):
    // K = 2 shared by t=1 and t=3 -> earliest day wins; p clamps at 1
    val rows = Seq((1, 1.0), (2, 2.0), (3, 1.0), (4, 2.0)).map {
      case (d, v) => (1L, ts(f"2024-03-$d%02d 09:00:00"), v) }
      .toDF("user_id", "t", "v")
    val r = graft.events.Resample.pettittChangepoint(rows, "user_id",
        col("t"), col("v"))
      .as[(Long, Long, Long, String, Double, Int)].collect().head
    r._3 shouldBe 2L
    r._4 shouldBe "2024-03-01"
    r._5 shouldBe 1.0
    r._6 shouldBe 0
  }

  it should "flag a long strong shift, stay partition-invariant, and NULL single-day entities" in {
    val rows = (1 to 28).map { d =>
      (9L, ts(f"2024-03-$d%02d 12:00:00"),
        if (d <= 14) 2.0 + d % 3 else 40.0 + d % 3)
    } :+ ((5L, ts("2024-03-01 12:00:00"), 7.0))
    val df = rows.toDF("user_id", "t", "v")
    def run(parts: Int) = graft.events.Resample.pettittChangepoint(
      df.repartition(parts), "user_id", col("t"), col("v"))
      .orderBy(col("user_id"))
      .as[(Long, Long, Long, String, Option[Double], Option[Int])]
      .collect().toSeq
    val a = run(2)
    a shouldBe run(7)
    val single = a.find(_._1 == 5L).get
    single._5 shouldBe None
    single._6 shouldBe None
    val shifted = a.find(_._1 == 9L).get
    shifted._4 shouldBe "2024-03-14"
    shifted._6 shouldBe Some(1)
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Resample.mannKendall (E37)"

  private def ts2(s: String) = java.sql.Timestamp.valueOf(s)

  it should "reproduce the hand-computed S, tie-corrected variance and z" in {
    // series 1, 3, 2, 2, 5 over five days (one value per day):
    // pairs (i<j): (1,3)+ (1,2)+ (1,2)+ (1,5)+ (3,2)- (3,2)- (3,5)+
    //   (2,2)0 (2,5)+ (2,5)+  => S = 7 - 2 = 5
    // n=5, ties: one pair of 2s (t=2): varNum = 5*4*15 - 2*1*9 = 282
    // var = 282/18 = 15.6667; z = (5-1)/sqrt(15.6667) = 1.010153...
    val rows = Seq(1.0, 3.0, 2.0, 2.0, 5.0).zipWithIndex.map {
      case (v, i) => (1L, ts2(f"2024-03-${i + 1}%02d 10:00:00"), v) }
    val r = graft.events.Resample.mannKendall(
      rows.toDF("user_id", "t", "v"), "user_id", col("t"), col("v"))
      .as[(Long, Long, Long, Double, Option[Double])].collect().head
    r._2 shouldBe 5L
    r._3 shouldBe 5L
    r._4 shouldBe math.floor(282.0 / 18.0 * 1e6 + 0.5) / 1e6
    r._5.get shouldBe
      math.floor(4.0 / math.sqrt(282.0 / 18.0) * 1e6 + 0.5) / 1e6
    graft.util.Caches.releaseAll(spark)
  }

  it should "max out S on a monotone series, zero it on a flat one, and stay partition-invariant" in {
    val rows =
      (1 to 12).map(d => (1L, ts2(f"2024-03-$d%02d 10:00:00"),
        d * 2.0)) ++ // strictly rising: S = 66
      (1 to 12).map(d => (2L, ts2(f"2024-03-$d%02d 10:00:00"),
        7.0)) ++ // flat: S = 0, var 0 -> NULL z
      Seq((3L, ts2("2024-03-01 10:00:00"), 1.0)) // single day -> NULL z
    val df = rows.toDF("user_id", "t", "v")
    def run(parts: Int) = graft.events.Resample.mannKendall(
      df.repartition(parts), "user_id", col("t"), col("v"))
      .orderBy(col("user_id"))
      .as[(Long, Long, Long, Double, Option[Double])].collect().toSeq
    val a = run(2)
    a shouldBe run(7)
    a(0)._3 shouldBe 66L // 12*11/2 concordant pairs, none discordant
    a(0)._5.get should be > 0.0
    a(1)._3 shouldBe 0L
    a(1)._5 shouldBe None // all-tied: zero variance reported as NULL
    a(2)._3 shouldBe 0L
    a(2)._5 shouldBe None
    // two purchases on ONE day collapse to a daily sum (the E16/E36
    // dailies contract), leaving a single observation -> NULL z
    val sameDay = Seq(
      (9L, ts2("2024-03-01 08:00:00"), 1.0),
      (9L, ts2("2024-03-01 18:00:00"), 99.0)).toDF("user_id", "t", "v")
    graft.events.Resample.mannKendall(sameDay, "user_id", col("t"),
      col("v"))
      .as[(Long, Long, Long, Double, Option[Double])]
      .collect().head._2 shouldBe 1L
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Resample.seasonalMannKendall (E39)"

  it should "reproduce hand per-season S and tie-corrected variance sums" in {
    // Mondays (2024-03-04/11/18): 10,20,30 -> S_Mon = 3, varNum 66
    // Tuesdays (03-05/12/19): 5,1,5 -> S_Tue = 0, tie t=2 -> varNum 48
    // S' = 3, Var' = 114/18; z = (3-1)/sqrt(114/18) = 0.794719
    val rows = Seq(
      (1L, ts("2024-03-04 10:00:00"), 10.0),
      (1L, ts("2024-03-11 10:00:00"), 20.0),
      (1L, ts("2024-03-18 10:00:00"), 30.0),
      (1L, ts("2024-03-05 10:00:00"), 5.0),
      (1L, ts("2024-03-12 10:00:00"), 1.0),
      (1L, ts("2024-03-19 10:00:00"), 5.0)).toDF("k", "t", "v")
    val r = graft.events.Resample.seasonalMannKendall(rows, "k",
      col("t"), col("v"))
      .as[(Long, Long, Long, Long, Double, Option[Double])]
      .collect().head
    r._2 shouldBe 2L // seasons touched
    r._3 shouldBe 6L
    r._4 shouldBe 3L
    r._5 shouldBe math.floor(114.0 / 18.0 * 1e6 + 0.5) / 1e6
    r._6.get shouldBe
      math.floor(2.0 / math.sqrt(114.0 / 18.0) * 1e6 + 0.5) / 1e6
    graft.util.Caches.releaseAll(spark)
  }

  it should "see through weekly seasonality that drowns plain MK, and stay partition-invariant" in {
    // 4 weeks, strong weekday rhythm (weekends ~0, weekdays ~100) plus
    // a small true upward trend (+1 per week): plain MK wastes most
    // pairs comparing Mondays to Sundays; Hirsch-Slack compares within
    // each weekday and reads the trend at full strength
    val rows = (0 until 28).map { i =>
      val day = i + 4 // 2024-03-04 (Monday) .. 2024-03-31
      val dow = i % 7 // 0 = Monday
      val base = if (dow >= 5) 0.0 else 100.0
      (1L, ts(f"2024-03-$day%02d 10:00:00"), base + i / 7)
    }.toDF("k", "t", "v")
    def smk(df: org.apache.spark.sql.DataFrame) =
      graft.events.Resample.seasonalMannKendall(df, "k", col("t"),
        col("v"))
        .as[(Long, Long, Long, Long, Double, Option[Double])]
        .collect().head
    val seasonal = smk(rows)
    val plain = graft.events.Resample.mannKendall(rows, "k", col("t"),
      col("v"))
      .as[(Long, Long, Long, Double, Option[Double])].collect().head
    seasonal._2 shouldBe 7L
    // every weekday rises strictly across its 4 weeks: S' = 7 * 6 = 42
    seasonal._4 shouldBe 42L
    seasonal._6.get should be > 5.0
    // measured: seasonal z = 5.26 vs plain 2.66 — the within-season
    // comparison roughly doubles the trend signal on this fixture
    seasonal._6.get should be > plain._5.get * 1.5
    smk(rows.repartition(13)) shouldBe seasonal
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Resample.seasonalTheilSen (E40)"

  it should "median within-season slopes, immune to the weekend cliff" in {
    // the E39 confound fixture: weekday base 100 / weekend 0, +1 per
    // week. Within every weekday the only pairs are 7/14/21 days apart
    // with slope exactly 1/7; a plain all-pairs Theil-Sen would mix in
    // the +-100 cliff slopes
    val rows = (0 until 28).map { i =>
      val day = i + 4
      val dow = i % 7
      val base = if (dow >= 5) 0.0 else 100.0
      (1L, ts(f"2024-03-$day%02d 10:00:00"), base + i / 7)
    }.toDF("k", "t", "v")
    val r = graft.events.Resample.seasonalTheilSen(rows, "k", col("t"),
      col("v"))
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    r._2 shouldBe 7L
    r._3 shouldBe 28L
    r._4 shouldBe 7L * 6L // C(4,2) = 6 pairs per weekday
    r._5.get shouldBe math.floor(1.0 / 7.0 * 1e6 + 0.5) / 1e6
    // a single-day entity has no pair -> NULL slope, n_pairs 0
    val single = Seq((9L, ts("2024-03-04 10:00:00"), 5.0))
      .toDF("k", "t", "v")
    val s = graft.events.Resample.seasonalTheilSen(single, "k",
      col("t"), col("v"))
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    s._4 shouldBe 0L
    s._5 shouldBe None
    // partition invariance
    graft.events.Resample.seasonalTheilSen(rows.repartition(13), "k",
      col("t"), col("v"))
      .as[(Long, Long, Long, Long, Option[Double])]
      .collect().head shouldBe r
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Resample.anomalousDays (E41)"

  it should "unmask the smaller spike only after the big one is clipped" in {
    // base days 9/10/11, one 1000 spike, one 100 spike: round 1's sd
    // (~211, inflated by the 1000) hides the 100; after clipping the
    // 1000, round 2's sd (~20) exposes it — the masking failure a
    // single-pass z-score ships
    val rows = (1 to 20).map { d =>
      ("m", ts(f"2024-03-$d%02d 10:00:00"), 10.0 + d % 3 - 1)
    } ++ Seq(
      ("m", ts("2024-03-21 10:00:00"), 1000.0),
      ("m", ts("2024-03-22 10:00:00"), 100.0))
    val df = rows.toDF("k", "t", "v")
    val two = graft.events.Resample.anomalousDays(df, "k", col("t"),
      col("v"), nSigma = 3.0, maxIter = 2)
      .as[(String, String, Double, Option[Double], Int)]
      .collect().toSeq
    two.map(r => (r._2, r._3, r._5)) shouldBe Seq(
      ("2024-03-21", 1000.0, 1), ("2024-03-22", 100.0, 2))
    all(two.map(_._4.get)) should be > 3.0
    // a single pass reports only the big spike — masking demonstrated
    val one = graft.events.Resample.anomalousDays(df, "k", col("t"),
      col("v"), nSigma = 3.0, maxIter = 1)
      .as[(String, String, Double, Option[Double], Int)]
      .collect().toSeq
    one.map(_._3) shouldBe Seq(1000.0)
    // partition invariance
    graft.events.Resample.anomalousDays(df.repartition(13), "k",
      col("t"), col("v"), nSigma = 3.0, maxIter = 2)
      .as[(String, String, Double, Option[Double], Int)]
      .collect().toSeq shouldBe two
    // a 2-day entity can't vote a day out
    val tiny = Seq(("s", ts("2024-03-01 10:00:00"), 1.0),
      ("s", ts("2024-03-02 10:00:00"), 1e6)).toDF("k", "t", "v")
    graft.events.Resample.anomalousDays(tiny, "k", col("t"), col("v"))
      .count() shouldBe 0L
    // the daily-family grid guard: an out-of-grid daily sum fails loud
    // instead of silently skewing the moments against the day count
    val big = Seq(("g", ts("2024-03-01 10:00:00"), 2.0e12),
      ("g", ts("2024-03-02 10:00:00"), 1.0),
      ("g", ts("2024-03-03 10:00:00"), 2.0)).toDF("k", "t", "v")
    val e = intercept[Exception] {
      graft.events.Resample.anomalousDays(big, "k", col("t"),
        col("v")).collect()
    }
    e.getMessage.toLowerCase.replace(" ", "") should
      include("decimal(18,6)")
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Resample.runsTest (E42)"

  it should "read clumping below zero and alternation above, with hand-exact z" in {
    // clumped 1,2,(3),10,11,12: lower median 3 excluded, B B A A A ->
    // runs 2, mu = 3.4, var = 0.84, z = -1.4/sqrt(0.84) = -1.527525
    val clumped = Seq(1.0, 2.0, 3.0, 10.0, 11.0, 12.0).zipWithIndex
      .map { case (v, i) => ("c", ts(f"2024-03-${i + 1}%02d 10:00:00"), v) }
    // alternating 1,10,2,11,(3),12: B A B A A -> runs 4, z > 0
    val alt = Seq(1.0, 10.0, 2.0, 11.0, 3.0, 12.0).zipWithIndex
      .map { case (v, i) => ("a", ts(f"2024-03-${i + 1}%02d 10:00:00"), v) }
    val df = (clumped ++ alt).toDF("k", "t", "v")
    val r = graft.events.Resample.runsTest(df, "k", col("t"), col("v"))
      .as[(String, Long, Long, Long, Long, Option[Double])]
      .collect().map(x => x._1 -> x).toMap
    r("c")._2 shouldBe 5L
    r("c")._3 shouldBe 3L // above
    r("c")._4 shouldBe 2L // below
    r("c")._5 shouldBe 2L // runs
    val zHand = (2.0 - 3.4) / math.sqrt(0.84)
    r("c")._6.get shouldBe math.floor(zHand * 1e6 + 0.5) / 1e6
    r("a")._5 shouldBe 4L
    r("a")._6.get should be > 0.0
    r("c")._6.get should be < 0.0
    // one-sided entity (every non-median day above) -> NULL z
    val oneSide = Seq(1.0, 9.0, 9.0, 9.0).zipWithIndex
      .map { case (v, i) => ("o", ts(f"2024-03-${i + 1}%02d 10:00:00"), v) }
      .toDF("k", "t", "v")
    graft.events.Resample.runsTest(oneSide, "k", col("t"), col("v"))
      .as[(String, Long, Long, Long, Long, Option[Double])]
      .collect().head._6 shouldBe None
    // partition invariance
    graft.events.Resample.runsTest(df.repartition(13), "k", col("t"),
      col("v"))
      .as[(String, Long, Long, Long, Long, Option[Double])]
      .collect().map(x => x._1 -> x).toMap shouldBe r
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Resample.pageHinkley (E38)"

  it should "reproduce the hand micro-integer recursion and alarm day" in {
    // dailies 10,10,10,20,20 (delta=0): U = (0,0,0,7.5,13.5) via the
    // truncating running mean (C//t = 10,10,10,12.5->12.5 exact,14);
    // PH = U - minU = U; first PH > 5 on day 4; ph_max = 13.5
    val rows = (1 to 5).map { d =>
      ("m", ts(f"2024-03-$d%02d 10:00:00"), if (d <= 3) 10.0 else 20.0)
    }.toDF("k", "t", "v")
    val r = graft.events.Resample.pageHinkley(rows, "k", col("t"),
        col("v"), delta = 0.0, lambda = 5.0)
      .as[(String, Long, Double, String, Int)].collect().head
    r shouldBe (("m", 5L, 13.5, "2024-03-04", 1))
    // a flat series never fires and PH stays 0
    val flat = (1 to 5).map(d =>
      ("f", ts(f"2024-03-$d%02d 10:00:00"), 10.0)).toDF("k", "t", "v")
    val rf = graft.events.Resample.pageHinkley(flat, "k", col("t"),
        col("v"), delta = 0.0, lambda = 5.0)
      .as[(String, Long, Double, Option[String], Int)].collect().head
    rf shouldBe (("f", 5L, 0.0, None, 0))
  }

  it should "flip direction with detectIncrease=false and reject bad lambda" in {
    val rows = (1 to 5).map { d =>
      ("d", ts(f"2024-03-$d%02d 10:00:00"), if (d <= 3) 20.0 else 10.0)
    }.toDF("k", "t", "v")
    // a mean DROP: increase monitor stays quiet, decrease monitor fires
    graft.events.Resample.pageHinkley(rows, "k", col("t"), col("v"),
        delta = 0.0, lambda = 5.0)
      .select("alarmed").as[Int].collect().head shouldBe 0
    graft.events.Resample.pageHinkley(rows, "k", col("t"), col("v"),
        delta = 0.0, lambda = 5.0, detectIncrease = false)
      .select("alarmed").as[Int].collect().head shouldBe 1
    an[IllegalArgumentException] should be thrownBy
      graft.events.Resample.pageHinkley(rows, "k", col("t"), col("v"),
        delta = 0.0, lambda = 0.0)
  }

  it should "keep Page-Hinkley partition-invariant and intra-day-order-free" in {
    val rows = (1 to 60).flatMap { i =>
      val d = i % 20 + 1
      Seq((s"u${i % 3}", ts(f"2024-04-$d%02d ${i % 24}%02d:00:00"),
        (i * 7 % 23).toDouble))
    }.toDF("k", "t", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.events.Resample.pageHinkley(df, "k", col("t"), col("v"),
          delta = 1.0, lambda = 10.0)
        .orderBy(col("k"))
        .as[(String, Long, Double, Option[String], Int)].collect().toSeq
    run(rows.coalesce(1)) shouldBe run(rows.repartition(13))
    run(rows.orderBy(rand(42))) shouldBe run(rows)
  }

  it should "fail loud when a daily sum leaves the DECIMAL(18,6) grid" in {
    // one 2e12 day overflows the micro cast; pre-guard this NULLed
    // silently and the windowed sums skipped the day (corrupting
    // C_t/U_t/ph_max) — now raise_error, the BIGINT contract enforced
    val rows = Seq(
      ("m", ts("2024-03-01 10:00:00"), 10.0),
      ("m", ts("2024-03-02 10:00:00"), 2.0e12)).toDF("k", "t", "v")
    // ANSI-on sessions fail at the cast itself; non-ANSI sessions hit
    // the raise_error guard — both loud, both name the decimal grid
    val e = intercept[Exception] {
      graft.events.Resample.pageHinkley(rows, "k", col("t"), col("v"),
        delta = 0.0, lambda = 5.0).collect()
    }
    e.getMessage.toLowerCase.replace(" ", "") should
      include("decimal(18,6)")
  }
}
