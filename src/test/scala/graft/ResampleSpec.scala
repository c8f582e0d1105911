package graft

import graft.events.Resample
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String) = java.sql.Timestamp.valueOf(s)

  it should "fill gaps forward from the previous observed day, per key" in {
    val df = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10.0),
      (1L, ts("2024-01-01 10:00:00"), 5.0),  // same day: aggregated
      (1L, ts("2024-01-04 08:00:00"), 7.0),  // 2-day gap before
      (2L, ts("2024-01-02 12:00:00"), 1.0))  // singleton key
      .toDF("user_id", "ts", "value")
    val r = Resample.dailyResampleFfill(df, "user_id", col("ts"), col("value"))
      .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
      .as[(Long, String, Double, Int)].collect().sortBy(t => (t._1, t._2))
    r shouldBe Array(
      (1L, "2024-01-01", 15.0, 0),
      (1L, "2024-01-02", 15.0, 1),
      (1L, "2024-01-03", 15.0, 1),
      (1L, "2024-01-04", 7.0, 0),
      (2L, "2024-01-02", 1.0, 0))
  }

  "kaplanMeier (E19)" should "match the hand-computed curve with censoring and the exact-zero tail" in {
    // user 1: events day 1, 3, 5 -> complete gaps 2, 2; censored 3
    // user 2: events day 1, 6 -> complete gap 5; censored 2
    // observation end day 8. Spans: {2,2,5 complete; 3,2 censored}
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-03 10:00:00")),
      (1L, ts("2024-01-05 10:00:00")),
      (2L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-06 10:00:00")))
      .toDF("user_id", "ts")
    val r = Resample.kaplanMeier(ev, "user_id", col("ts"), "2024-01-08")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(x => x._1 -> x).toMap
    r(2L) shouldBe ((2L, 5L, 2L, 1L, 0.6))  // S(2) = 1 - 2/5
    r(3L) shouldBe ((3L, 2L, 0L, 1L, 0.6))  // censoring shrinks risk only
    r(5L) shouldBe ((5L, 1L, 1L, 0L, 0.0))  // d = n: exact zero, no ln(0)
    graft.util.Caches.releaseAll(spark)
  }

  "activationSurvival (E25)" should "curve hand-computed conversion spans with censoring and day-0" in {
    // u1: first touch day 1, purchase day 3 -> t=2 complete
    // u2: first touch day 1 IS a purchase -> t=0 complete
    // u3: first touch day 2, never converts -> censored at day 6 (t=4)
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "purchase", ts("2024-01-03 10:00:00")),
      (2L, "purchase", ts("2024-01-01 09:00:00")),
      (3L, "view", ts("2024-01-02 12:00:00")))
      .toDF("user_id", "event_type", "ts")
      .withColumn("event_id", col("user_id"))
    val r = Resample.activationSurvival(ev, "purchase", "2024-01-06")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(x => x._1 -> x).toMap
    // t=0: risk 3, 1 event -> S(0) = 2/3
    r(0L) shouldBe ((0L, 3L, 1L, 0L, 0.666667))
    // t=2: risk 2, 1 event -> S(2) = 2/3 * 1/2 = 1/3
    r(2L) shouldBe ((2L, 2L, 1L, 0L, 0.333333))
    // t=4: censored only -> survival unchanged
    r(4L) shouldBe ((4L, 1L, 0L, 1L, 0.333333))
    graft.util.Caches.releaseAll(spark)
  }

  "stlDecompose (E18)" should "decompose a constant series to trend-only and stay additive" in {
    val flat = (1 to 14).map(d =>
      (1L, ts(f"2024-01-$d%02d 09:00:00"), 10.0))
      .toDF("user_id", "ts", "value")
    val r = Resample.stlDecompose(flat, "user_id", col("ts"),
        col("value"))
      .select(col("value"), col("trend"), col("seasonal"),
        col("remainder"))
      .as[(Double, Double, Double, Double)].collect()
    r.length shouldBe 14
    r.foreach { case (v, t, s, rem) =>
      t shouldBe 10.0 +- 1e-9
      s shouldBe 0.0 +- 1e-9
      rem shouldBe 0.0 +- 1e-9
      (t + s + rem) shouldBe v +- 1e-5 // additivity (round-6 outputs)
    }
    // a varying series still reconstructs additively
    val vary = (1 to 21).map(d =>
      (1L, ts(f"2024-01-$d%02d 09:00:00"), 10.0 + (d % 7) * 3.0))
      .toDF("user_id", "ts", "value")
    Resample.stlDecompose(vary, "user_id", col("ts"), col("value"))
      .select(col("value"), col("trend"), col("seasonal"),
        col("remainder"))
      .as[(Double, Double, Double, Double)].collect()
      .foreach { case (v, t, s, rem) =>
        (t + s + rem) shouldBe v +- 1e-5 }
    graft.util.Caches.releaseAll(spark)
  }

  "cusumChangepoint (E16)" should "flag the level-shift day at the cumulative-deviation peak" in {
    // 4 days at 10 then 4 days at 50: mean 30, |S| peaks at the last
    // low day (day 4, S = -80), the classic AMOC estimate
    val rows = (1 to 8).map { d =>
      (1L, ts(f"2024-01-0$d%d 09:00:00"), if (d <= 4) 10.0 else 50.0)
    }
    val r = Resample.cusumChangepoint(rows.toDF("user_id", "ts", "value"),
        "user_id", col("ts"), col("value"))
      .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
      .select(col("day"), col("cusum"), col("is_changepoint"))
      .as[(String, Double, Int)].collect().sortBy(_._1)
    r.map(_._3).sum shouldBe 1 // exactly one changepoint per key
    r.find(_._3 == 1).get._1 shouldBe "2024-01-04"
    r.find(_._1 == "2024-01-04").get._2 shouldBe -80.0 +- 1e-9
    r.last._2 shouldBe 0.0 +- 1e-9 // S returns to zero at the end
    graft.util.Caches.releaseAll(spark)
  }

  it should "produce bit-identical output under any input partitioning (decimal-exact sums)" in {
    // The r9 hash-parity failure mode: float daily/moment sums
    // accumulate in partition-dependent order. With DECIMAL carries,
    // every permutation of the input must collect the SAME rows.
    val rnd = new scala.util.Random(42)
    val rows = (0 until 2000).map { i =>
      (rnd.nextInt(20).toLong,
        ts(f"2024-01-${1 + rnd.nextInt(28)}%02d ${rnd.nextInt(24)}%02d:00:00"),
        // 2-decimal values, like the events table
        math.round(rnd.nextDouble() * 10000) / 100.0)
    }
    def canon(df: org.apache.spark.sql.DataFrame) = {
      val cu = Resample.cusumChangepoint(df, "user_id", col("ts"),
          col("value"))
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
        .as[(Long, String, Double, Double, Int)]
        .collect().sortBy(t => (t._1, t._2)).toSeq
      val dw = Resample.dowSeasonalityStrength(df, "user_id", col("ts"),
          col("value"))
        .as[(Long, Long, Double, Double, Double)]
        .collect().sortBy(_._1).toSeq
      (cu, dw)
    }
    val base = rows.toDF("user_id", "ts", "value")
    val a = canon(base.repartition(1))
    val b = canon(base.repartition(17, col("value")))
    val c = canon(base.orderBy(col("value").desc).repartition(5))
    a shouldBe b
    a shouldBe c
    graft.util.Caches.releaseAll(spark)
  }

  "autocorrelation (E20)" should "recover the alternating-series signature and drop gap pairs" in {
    // days 1-4 alternating 10,20,10,20: mean 15, devs -5,5,-5,5
    // lag1: 3 pairs, num -75, den 100 -> -0.75; lag2: 2 pairs -> 0.5
    val alt = (1 to 4).map(d =>
      (1L, ts(f"2024-01-0$d%d 09:00:00"), if (d % 2 == 1) 10.0 else 20.0))
      .toDF("user_id", "ts", "value")
    val r = Resample.autocorrelation(alt, "user_id", col("ts"),
        col("value"), maxLag = 3)
      .select(col("lag"), col("n_pairs"), col("acf"))
      .as[(Long, Long, Double)].collect().map(t => t._1 -> t).toMap
    r(1L) shouldBe ((1L, 3L, -0.75))
    r(2L) shouldBe ((2L, 2L, 0.5))
    r(3L) shouldBe ((3L, 1L, -0.25)) // (-5)(5) / 100
    // a calendar gap drops the missing pair instead of shifting it
    val gap = Seq(
      (2L, ts("2024-01-01 09:00:00"), 10.0),
      (2L, ts("2024-01-02 09:00:00"), 20.0),
      (2L, ts("2024-01-04 09:00:00"), 30.0))
      .toDF("user_id", "ts", "value")
    val g = Resample.autocorrelation(gap, "user_id", col("ts"),
        col("value"), maxLag = 3)
      .select(col("lag"), col("n_pairs"))
      .as[(Long, Long)].collect().toMap
    g shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
    // flat series: zero variance -> NULL acf, no division error
    val flat = (1 to 5).map(d =>
      (3L, ts(f"2024-01-0$d%d 09:00:00"), 4.0))
      .toDF("user_id", "ts", "value")
    Resample.autocorrelation(flat, "user_id", col("ts"), col("value"),
        maxLag = 2)
      .select(col("acf")).as[Option[Double]].collect()
      .foreach(_ shouldBe None)
    graft.util.Caches.releaseAll(spark)
  }

  "ewmaDaily (E15)" should "decay by day lag and renormalize over observed days" in {
    // observed days 1, 2, 4 (gap at 3), alpha 0.3 -> beta 0.7
    val df = Seq(
      (1L, ts("2024-01-01 08:00:00"), 10.0),
      (1L, ts("2024-01-02 08:00:00"), 20.0),
      (1L, ts("2024-01-04 08:00:00"), 40.0))
      .toDF("user_id", "ts", "value")
    val r = Resample.ewmaDaily(df, "user_id", col("ts"), col("value"),
        alpha = 0.3, window = 14)
      .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
      .select(col("day"), col("ewma")).as[(String, Double)]
      .collect().toMap
    val b = 0.7
    r("2024-01-01") shouldBe 10.0 +- 1e-12
    r("2024-01-02") shouldBe
      ((20.0 + b * 10.0) / (1 + b)) +- 1e-12
    // day 4: lags 0 (x=40), 2 (x=20), 3 (x=10) — day 3 contributes no
    // weight to the denominator (renormalization over OBSERVED lags)
    r("2024-01-04") shouldBe
      ((40.0 + b * b * 20.0 + b * b * b * 10.0) /
        (1 + b * b + b * b * b)) +- 1e-12
    graft.util.Caches.releaseAll(spark)
  }

  it should "truncate influence beyond the window horizon" in {
    val df = Seq(
      (1L, ts("2024-01-01 08:00:00"), 1000.0),
      (1L, ts("2024-03-01 08:00:00"), 1.0)) // 60 days later
      .toDF("user_id", "ts", "value")
    val r = Resample.ewmaDaily(df, "user_id", col("ts"), col("value"),
        alpha = 0.3, window = 14)
      .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
      .select(col("day"), col("ewma")).as[(String, Double)]
      .collect().toMap
    r("2024-03-01") shouldBe 1.0 +- 1e-12 // the old spike is out of horizon
    graft.util.Caches.releaseAll(spark)
  }

  it should "produce a contiguous daily series per key (no holes, no duplicates)" in {
    val rnd = new scala.util.Random(7)
    val df = (0 until 300).map { _ =>
      (rnd.nextInt(5).toLong,
        ts(f"2024-01-${1 + rnd.nextInt(28)}%02d 06:00:00"),
        rnd.nextInt(100).toDouble)
    }.toDF("user_id", "ts", "value")
    val days = Resample.dailyResampleFfill(df, "user_id", col("ts"), col("value"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("day")).as("nd"),
        datediff(max(col("day")), min(col("day"))).as("span"))
      .as[(Long, Long, Long, Int)].collect()
    days.foreach { case (_, n, nd, span) =>
      n shouldBe nd         // no duplicate days
      n shouldBe span + 1L  // no holes: first..last inclusive
    }
  }

  "seasonalNaiveAnomaly (E28)" should "forecast the same-weekday trailing mean and flag the planted spike" in {
    import spark.implicits._
    // user 1: five consecutive Mondays at 10.0, the sixth at 100.0 —
    // the sixth's forecast is the prior-4 mean 10.0, residual 90 (the
    // only big residual -> MAD flags it); plus interleaved Tuesdays at
    // 5.0 that must NOT pollute Monday's forecast.
    def onDay(base: String, plusDays: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.parse(base).plusDays(plusDays)
        .atTime(9, 0, 0))
    val mondays = (0 to 5).map(i =>
      (1L, onDay("2024-01-01", 7 * i), if (i == 5) 100.0 else 10.0))
    val tuesdays = (0 to 5).map(i =>
      (1L, onDay("2024-01-02", 7 * i), 5.0))
    val ev = (mondays ++ tuesdays).toDF("user_id", "ts", "value")
    val r = graft.events.Resample.seasonalNaiveAnomaly(ev, "user_id",
        col("ts"), col("value"), trailingWeeks = 4, k = 3.0)
      .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
      .as[(Long, String, Double, Option[Double], Option[Double],
        Option[Double], Option[Double], Option[Int])]
      .collect().map(t => t._2 -> t).toMap
    r("2024-01-01")._4 shouldBe None // first Monday: no history
    r("2024-01-08")._4 shouldBe Some(10.0) // one prior Monday
    r("2024-01-29")._4 shouldBe Some(10.0)
    val spike = r("2024-02-05")
    spike._3 shouldBe 100.0
    spike._4 shouldBe Some(10.0) // trailing-4 Monday mean, Tuesdays out
    spike._5 shouldBe Some(90.0)
    spike._8 shouldBe Some(1) // flagged
    // the in-rhythm days are not flagged
    r("2024-01-29")._8 shouldBe Some(0)
    graft.util.Caches.releaseAll(spark)
  }

  "forecastEval (E31)" should "score a linear ramp MASE 7 and NULL a flat series' MASE" in {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // linear ramp x_t = t over 10 days: |x_t - x_{t-7}| = 7,
    // lag-1 scale = 1 -> MASE exactly 7
    val ramp = (1 to 10).map(i =>
      ("ramp", s"2024-01-${"%02d".format(i)} 00:00:00", i.toDouble))
    // flat series: every error 0 AND scale 0 -> mae 0, mase NULL
    val flat = (1 to 10).map(i =>
      ("flat", s"2024-01-${"%02d".format(i)} 00:00:00", 5.0))
    val df = (ramp ++ flat).toDF("k", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val r = graft.events.Resample.forecastEval(df, "k", col("ts"),
      col("v"), season = 7)
      .select("k", "n_days", "n_eval", "mae", "rmse", "scale", "mase",
        "smape")
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double], Option[Double])]
      .collect().map(t => t._1 -> t).toMap
    val (_, nd, ne, mae, rmse, scale, mase, smape) = r("ramp")
    nd shouldBe 10L; ne shouldBe 3L // days 8..10 have a lag-7 value
    mae.get shouldBe 7.0
    rmse.get shouldBe 7.0
    scale.get shouldBe 1.0
    mase.get shouldBe 7.0
    // smape terms: day8 2*7/(8+1), day9 2*7/(9+2), day10 2*7/(10+3)
    val sm = Seq(14.0 / 9, 14.0 / 11, 14.0 / 13)
      .map(x => math.floor(x * 1e6 + 0.5)).sum / 1e6 / 3
    smape.get shouldBe math.floor(sm * 1e6 + 0.5) / 1e6 +- 1e-9
    val f = r("flat")
    f._4.get shouldBe 0.0 // mae
    f._6.get shouldBe 0.0 // scale
    f._7 shouldBe None    // mase undefined on a no-variation series
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "seriesAutocorrelation (E43)"

  it should "compute the hand-checked Box-Jenkins ACF with a shared denominator" in {
    // x = 1,2,3,4 on consecutive days: c = (-1.5,-.5,.5,1.5), den = 5;
    // r1 = 1.25/5, r2 = -1.5/5, r3 = -2.25/5, r4 has no pairs
    val events = (1 to 4).map(d =>
      (1L, ts(f"2024-01-0$d%d 10:00:00"), d.toDouble)).toDF("k", "t", "v")
    val out = Resample.seriesAutocorrelation(events, "k", col("t"),
      col("v"), maxLag = 4).orderBy(col("lag"))
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSeq
    out shouldBe Seq(
      (1L, 1L, 4L, 3L, Some(0.25)),
      (1L, 2L, 4L, 2L, Some(-0.3)),
      (1L, 3L, 4L, 1L, Some(-0.45)),
      (1L, 4L, 4L, 0L, None))
    // a constant series has zero variance: NULL r, pairs still counted
    val flat = (1 to 3).map(d =>
      (2L, ts(f"2024-01-0$d%d 10:00:00"), 7.0)).toDF("k", "t", "v")
    Resample.seriesAutocorrelation(flat, "k", col("t"), col("v"),
      maxLag = 2).orderBy(col("lag"))
      .select(col("n_pairs"), col("r"))
      .as[(Long, Option[Double])].collect().toSeq shouldBe
      Seq((2L, None), (1L, None))
    // partition invariance: the micro-integer moments are order-free
    val both = events.unionByName(flat)
    def run(df: org.apache.spark.sql.DataFrame) =
      Resample.seriesAutocorrelation(df, "k", col("t"), col("v"),
        maxLag = 3)
        .as[(Long, Long, Long, Long, Option[Double])]
        .collect().sortBy(r => (r._1, r._2)).toSeq
    run(both.coalesce(1)) shouldBe run(both.repartition(7))
    graft.util.Caches.releaseAll(spark)
  }
}
