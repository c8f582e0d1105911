package graft

import graft.events.EventFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-analytics semantics on a hand-computed fixture (reference behaviour:
  * src/test/scala/EventAnalysisSpec.scala:70-76,112-116). */
class EventFunctionsSpec extends SparkSpec {
  import spark.implicits._

  // (event_id, ts, user_id, event_type, value)
  private def ev: DataFrame = Seq(
    (1L, "2024-01-01 10:00:00", 1L, "view", 1.0),
    (2L, "2024-01-01 10:10:00", 1L, "view", 2.0),
    (3L, "2024-01-01 12:00:00", 1L, "purchase", 30.0),
    (4L, "2024-01-01 12:05:00", 1L, "view", 3.0),
    (5L, "2024-01-01 09:00:00", 2L, "signup", 0.0),
    (6L, "2024-01-02 09:00:00", 2L, "purchase", 50.0))
    .toDF("event_id", "ts", "user_id", "event_type", "value")
    .withColumn("ts", col("ts").cast("timestamp"))

  it should "compute trailing rolling features each row sees only its own past" in {
    // 1-hour trailing window: event 3 (12:00) sees only itself (the
    // 10:xx views fell out of range); event 4 (12:05) sees 3 and itself
    val r = graft.events.EventFeatures.trailingWindow(ev, windowSec = 3600)
      .select("event_id", "n_trailing", "sum_trailing", "max_trailing")
      .as[(Long, Long, Double, Double)].collect().map(t => t._1 -> t).toMap
    r(1L) shouldBe ((1L, 1L, 1.0, 1.0))
    r(2L) shouldBe ((2L, 2L, 3.0, 2.0))  // sees event 1
    r(3L) shouldBe ((3L, 1L, 30.0, 30.0)) // views are > 1h old
    r(4L) shouldBe ((4L, 2L, 33.0, 30.0)) // sees the purchase
    r(6L) shouldBe ((6L, 1L, 50.0, 50.0)) // other entity, day later
  }

  it should "assign session ids that break on the timeout gap" in {
    val s = EventFunctions.sessionize(ev, 3600)
      .select("user_id", "event_id", "session_id")
      .as[(Long, Long, Long)].collect().toSet
    s should contain allOf (
      (1L, 1L, 1L), (1L, 2L, 1L), // 10min gap, same session
      (1L, 3L, 2L), (1L, 4L, 2L), // 110min gap -> new session
      (2L, 5L, 1L), (2L, 6L, 2L))
  }

  it should "stringify chronological paths and collapse runs" in {
    EventFunctions.paths(ev.filter(col("user_id") === 1))
      .select("path").as[String].head() shouldBe "view,view,purchase,view"
    EventFunctions.uniquePaths(ev.filter(col("user_id") === 1))
      .select("path").as[String].head() shouldBe "view,purchase,view"
  }

  it should "pivot the latest feature values as-of a date" in {
    val snap = EventFunctions.snapshot(ev, "2024-01-01 12:00:00",
      Seq("view", "purchase"))
    val u1 = snap.filter(col("user_id") === 1).head()
    u1.getAs[Double]("view") shouldBe 2.0     // id 4 is after the as-of
    u1.getAs[Double]("purchase") shouldBe 30.0
  }

  it should "anchor chords at each entity's latest event of the type" in {
    val chords = EventFunctions.extractChords(ev, "purchase")
    chords.count() shouldBe 2
    val prev = EventFunctions.previousInteractionsBefore(ev, "purchase", 2)
    // user 1 anchor = 12:00; last 2 events at or before it: ids 3, 2
    prev.filter(col("user_id") === 1).select("event_id")
      .as[Long].collect().toSet shouldBe Set(2L, 3L)
  }

  it should "dedup to the latest id per (entity, type, ts)" in {
    val dup = ev.union(ev.withColumn("event_id", col("event_id") + 100))
    val cur = EventFunctions.current(dup)
    cur.count() shouldBe 6
    cur.agg(min("event_id")).as[Long].head() shouldBe 101L
  }

  behavior of "timeBoundedFunnel (W12)"

  private def fev(rows: (Long, Long, String, Long)*) =
    rows.map { case (u, sec, ty, id) =>
      (u, new java.sql.Timestamp(sec * 1000L), ty, id, 1.0) }
      .toDF("user_id", "ts", "event_type", "event_id", "value")

  it should "convert hand-checked chains with whole-chain window semantics" in {
    val events = fev(
      // u1: clean chain inside window
      (1L, 0L, "view", 1L), (1L, 10L, "click", 2L),
      (1L, 20L, "purchase", 3L),
      // u2: purchase without a click -> not converted
      (2L, 0L, "view", 4L), (2L, 10L, "purchase", 5L),
      // u3: click BEFORE any view must not count; later chain works
      (3L, 0L, "click", 6L), (3L, 10L, "view", 7L),
      (3L, 20L, "click", 8L), (3L, 30L, "purchase", 9L),
      // u4: every gap < window but the WHOLE chain exceeds it
      (4L, 0L, "view", 10L), (4L, 90L, "click", 11L),
      (4L, 110L, "purchase", 12L))
    val got = graft.events.EventFunctions.timeBoundedFunnel(
        events, Seq("view", "click", "purchase"), windowSec = 100L)
      .select(col("user_id"), col("n_final"), col("n_converted"),
        col("converted"))
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    got(1L) shouldBe ((1L, 1L, true))
    got(2L) shouldBe ((1L, 0L, false))
    got(3L) shouldBe ((1L, 1L, true))
    got(4L) shouldBe ((1L, 0L, false))
  }

  it should "prefer the latest restart and report the first completion" in {
    // stale first chain fails, a restart succeeds; first_conversion_ts
    // is the succeeding purchase
    val events = fev(
      (1L, 0L, "view", 1L), (1L, 5L, "click", 2L),
      (1L, 200L, "purchase", 3L), // start 0 -> 200 > 100: fails
      (1L, 250L, "view", 4L), (1L, 260L, "click", 5L),
      (1L, 300L, "purchase", 6L)) // start 250 -> 50 <= 100: converts
    val r = graft.events.EventFunctions.timeBoundedFunnel(
        events, Seq("view", "click", "purchase"), windowSec = 100L)
      .select(col("n_final"), col("n_converted"),
        col("first_conversion_ts").cast("long"))
      .as[(Long, Long, Long)].head()
    r shouldBe ((2L, 1L, 300L))
  }

  it should "handle funnels with more than three steps" in {
    val events = fev(
      (1L, 0L, "view", 1L), (1L, 10L, "click", 2L),
      (1L, 20L, "signup", 3L), (1L, 30L, "purchase", 4L),
      // u2 misses the signup step
      (2L, 0L, "view", 5L), (2L, 10L, "click", 6L),
      (2L, 30L, "purchase", 7L))
    val got = graft.events.EventFunctions.timeBoundedFunnel(
        events, Seq("view", "click", "signup", "purchase"), 100L)
      .select(col("user_id"), col("converted"))
      .as[(Long, Boolean)].collect().toMap
    got(1L) shouldBe true
    got(2L) shouldBe false
  }

  behavior of "cohortRetention (E11)"

  it should "build the hand-computed weekly retention matrix" in {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // weeks: W0 = Mon 2024-01-01, W1 = 01-08, W3 = 01-22
    // u1: cohort W0, returns W1; u2: cohort W0 only (twice, same week);
    // u3: cohort W1, returns W3
    val events = Seq(
      (1L, t("2024-01-02 10:00:00")), (1L, t("2024-01-09 10:00:00")),
      (2L, t("2024-01-03 10:00:00")), (2L, t("2024-01-05 10:00:00")),
      (3L, t("2024-01-10 10:00:00")), (3L, t("2024-01-24 10:00:00")))
      .toDF("user_id", "ts")
    val got = graft.events.EventFeatures.cohortRetention(events)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    got(("2024-01-01", 0L)) shouldBe ((2L, 2L, 1.0))
    got(("2024-01-01", 1L)) shouldBe ((2L, 1L, 0.5))
    got(("2024-01-08", 0L)) shouldBe ((1L, 1L, 1.0))
    got(("2024-01-08", 2L)) shouldBe ((1L, 1L, 1.0))
    got.size shouldBe 4 // no empty-offset rows invented
  }

  behavior of "rollingActiveUsers (E13)"

  it should "compute hand-checked DAU/WAU with a trailing window" in {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-02 10:00:00")),
      (2L, t("2024-01-02 11:00:00"))) // same user+day counted once
      .toDF("user_id", "ts")
    val got = graft.events.EventFeatures.rollingActiveUsers(events, 2)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    got("2024-01-01") shouldBe ((1L, 1L, 1.0))
    // day 2: u2 active today, u1 still inside the trailing-2 window
    got("2024-01-02") shouldBe ((1L, 2L, 0.5))
    got.size shouldBe 2 // no rows invented for inactive days
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "timeWeightedAverage (W21)"

  it should "integrate LOCF segments, counting the carried-in value from window start" in {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // u1: 10 carried IN from before the window (holds 60s), then 20
    // for the last 40s: twa = (10*60 + 20*40)/100 = 14 (plain mean 15)
    // u2: chatty then quiet — ten 100s inside one second, then 0 for
    // the rest: the plain mean says ~91, the time-weighted says ~1
    val rows = Seq(
      (1L, t("2024-03-01 09:59:00"), 10.0),
      (1L, t("2024-03-01 10:01:00"), 20.0)) ++
      (0 until 10).map(i =>
        (2L, t(f"2024-03-01 10:00:${i}%02d"), 100.0)) ++ Seq(
      (2L, t("2024-03-01 10:00:10"), 0.0),
      (3L, t("2024-03-01 11:00:00"), 7.0)) // entirely after the window
    val got = graft.events.EventFeatures.timeWeightedAverage(
      rows.toDF("user_id", "ts", "value"), "user_id", col("ts"),
      col("value"), "2024-03-01 10:00:00", "2024-03-01 10:01:40")
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    got(1L) shouldBe ((2L, 100L, Some(14.0)))
    // u2: 100 holds 10 x 1s segments, 0 holds the remaining 90s
    got(2L)._1 shouldBe 11L
    got(2L)._2 shouldBe 100L
    got(2L)._3.get shouldBe 10.0 +- 1e-9
    got.contains(3L) shouldBe false // nothing held inside the window
    // partition invariance
    graft.events.EventFeatures.timeWeightedAverage(
      rows.toDF("user_id", "ts", "value").repartition(7), "user_id",
      col("ts"), col("value"), "2024-03-01 10:00:00",
      "2024-03-01 10:01:40")
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap shouldBe got
    an[IllegalArgumentException] should be thrownBy
      graft.events.EventFeatures.timeWeightedAverage(
        rows.toDF("user_id", "ts", "value"), "user_id", col("ts"),
        col("value"), "2024-03-01 10:00:00", "2024-03-01 10:00:00")
    // an out-of-grid value fails loud — a silent NULL would keep the
    // segment's seconds in covered_sec while dropping its value
    val big = Seq((1L, t("2024-03-01 10:00:05"), 2.0e12))
      .toDF("user_id", "ts", "value")
    val e = intercept[Exception] {
      graft.events.EventFeatures.timeWeightedAverage(big, "user_id",
        col("ts"), col("value"), "2024-03-01 10:00:00",
        "2024-03-01 10:01:40").collect()
    }
    e.getMessage.toLowerCase.replace(" ", "") should
      include("decimal(18,6)")
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "rfmScores (E12)"

  it should "score hand-computed recency/frequency/monetary quintiles" in {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // u1: recent, frequent, rich; u2: middling; u3: stale, sparse, poor
    val events = Seq(
      (1L, t("2024-01-28 10:00:00"), 50.0),
      (1L, t("2024-01-29 10:00:00"), 50.0),
      (1L, t("2024-01-30 10:00:00"), 50.0),
      (2L, t("2024-01-20 10:00:00"), 20.0),
      (2L, t("2024-01-21 10:00:00"), 20.0),
      (3L, t("2024-01-05 10:00:00"), 1.0))
      .toDF("user_id", "ts", "value")
    val got = graft.events.EventFeatures.rfmScores(events, "2024-02-01")
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary"), col("rfm_segment"))
      .as[(Long, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    got(1L) shouldBe ((2L, 3L, 150.0, 333L))
    got(2L) shouldBe ((11L, 2L, 40.0, 222L))
    got(3L) shouldBe ((27L, 1L, 1.0, 111L))
  }

  "sequentialRules (W14)" should "count directed in-session patterns with exact support/confidence/lift" in {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1 session 1: view@10:00, click@10:10  -> supports view->click
    // user 1 session 2 (4h later): click@14:30, view@14:40 -> click->view
    // user 2 session 1: view@09:00, view@09:05 (view only)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view", 1L),
      (1L, ts("2024-01-01 10:10:00"), "click", 2L),
      (1L, ts("2024-01-01 14:30:00"), "click", 3L),
      (1L, ts("2024-01-01 14:40:00"), "view", 4L),
      (2L, ts("2024-01-01 09:00:00"), "view", 5L),
      (2L, ts("2024-01-01 09:05:00"), "view", 6L))
      .toDF("user_id", "ts", "event_type", "event_id")
      .withColumn("value", lit(1.0))
    val r = graft.events.EventFunctions.sequentialRules(events, 3600)
      .as[(String, String, Long, Double, Double)].collect()
      .map(x => (x._1, x._2) -> ((x._3, x._4, x._5))).toMap
    // 3 sessions; view in 3, click in 2
    val (s1, conf1, lift1) = r(("view", "click"))
    s1 shouldBe 1L
    conf1 shouldBe (1.0 / 3) +- 1e-15
    lift1 shouldBe ((1.0 / 3) / (2.0 / 3)) +- 1e-15
    r(("click", "view"))._1 shouldBe 1L // direction matters: other session
    r(("click", "view"))._2 shouldBe 0.5 +- 1e-15
    // no same-type rule, no cross-session pattern leakage
    r.keySet shouldBe Set(("view", "click"), ("click", "view"))
    graft.util.Caches.releaseAll(spark)
  }

  "sequentialTriples (W15)" should "detect a-then-b-then-c including the greedy middle-witness case" in {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // session 1: b@2, c@3, a@5, b@6, c@7 — supports a->b->c via the
    // LATER b and c (the early b/c are decoys the greedy must skip)
    // session 2 (user 2): c@1, b@2, a@3 — reverse order only
    val events = Seq(
      (1L, ts("2024-01-01 10:02:00"), "b", 1L),
      (1L, ts("2024-01-01 10:03:00"), "c", 2L),
      (1L, ts("2024-01-01 10:05:00"), "a", 3L),
      (1L, ts("2024-01-01 10:06:00"), "b", 4L),
      (1L, ts("2024-01-01 10:07:00"), "c", 5L),
      (2L, ts("2024-01-01 10:01:00"), "c", 6L),
      (2L, ts("2024-01-01 10:02:00"), "b", 7L),
      (2L, ts("2024-01-01 10:03:00"), "a", 8L))
      .toDF("user_id", "ts", "event_type", "event_id")
      .withColumn("value", lit(1.0))
    val got = graft.events.EventFunctions
      .sequentialTriples(events, 3600, minSupport = 1)
      .as[(String, String, String, Long)].collect()
      .map(t => (t._1, t._2, t._3) -> t._4).toMap
    got(("a", "b", "c")) shouldBe 1L // session 1 only
    got(("c", "b", "a")) shouldBe 1L // session 2 only (1's b@6 > a@5)
    got.get(("a", "c", "b")) shouldBe None // no b after session 1's last c
    // session 1 also has b->c->... etc; spot-check one more
    got(("b", "c", "a")) shouldBe 1L // b@2 < c@3 < a@5 in session 1
    graft.util.Caches.releaseAll(spark)
  }

  it should "require strict precedence: simultaneous a and b support neither direction" in {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view", 1L),
      (1L, ts("2024-01-01 10:00:00"), "click", 2L))
      .toDF("user_id", "ts", "event_type", "event_id")
      .withColumn("value", lit(1.0))
    graft.events.EventFunctions.sequentialRules(events, 3600)
      .count() shouldBe 0L
    graft.util.Caches.releaseAll(spark)
  }

  it should "pin all-null monetary to zero instead of engine-dependent NULL order" in {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, t("2024-01-28 10:00:00"), Some(5.0)),
      (2L, t("2024-01-20 10:00:00"), None))
      .toDF("user_id", "ts", "value")
    val m = graft.events.EventFeatures.rfmScores(events, "2024-02-01")
      .select(col("user_id"), col("monetary")).as[(Long, Double)]
      .collect().toMap
    m(2L) shouldBe 0.0
    m(1L) shouldBe 5.0
  }

  behavior of "funnelStepTiming (W19)"

  it should "time each leg of the LATEST-start chain and window out stale chains" in {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // an early chain start that must LOSE to the later one
      (1L, "view", ts("2024-01-05 09:00:00"), 1L),
      (1L, "click", ts("2024-01-05 09:30:00"), 2L),
      // the latest-start chain: view 10:00, click 10:05
      (1L, "view", ts("2024-01-05 10:00:00"), 3L),
      (1L, "click", ts("2024-01-05 10:05:00"), 4L),
      // a view AFTER the click must not disturb the chain
      (1L, "view", ts("2024-01-05 10:10:00"), 5L),
      (1L, "purchase", ts("2024-01-05 10:20:00"), 6L),
      // user 2: chain exceeds the 1h window -> dropped
      (2L, "view", ts("2024-01-05 08:00:00"), 7L),
      (2L, "click", ts("2024-01-05 08:10:00"), 8L),
      (2L, "purchase", ts("2024-01-05 09:30:00"), 9L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val r = graft.events.EventFunctions.funnelStepTiming(ev, "view",
        "click", "purchase", windowSec = 3600)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    r.length shouldBe 1
    val row = r.head
    row._1 shouldBe 1L
    row._2 shouldBe 6L
    row._6 shouldBe 300L  // leg1: view 10:00 -> click 10:05
    row._7 shouldBe 900L  // leg2: click 10:05 -> purchase 10:20
    row._8 shouldBe 1200L
    graft.util.Caches.releaseAll(spark)
  }

  it should "require a full chain: click-then-purchase with no view emits nothing" in {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, "click", ts("2024-01-05 10:00:00"), 1L),
      (1L, "purchase", ts("2024-01-05 10:10:00"), 2L))
      .toDF("user_id", "event_type", "ts", "event_id")
    graft.events.EventFunctions.funnelStepTiming(ev, "view", "click",
      "purchase", 3600).count() shouldBe 0L
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "ltvCurves (E23)"

  it should "accumulate hand-computed per-user value along cohort age" in {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // cohort of Mon 2024-01-01: users 1,2 (size 2).
    // week 0: u1 10 + u2 20 = 30; week 1: u1 6 -> cum 36
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00"), 10.0),
      (2L, ts("2024-01-03 10:00:00"), 20.0),
      (1L, ts("2024-01-09 10:00:00"), 6.0))
      .toDF("user_id", "ts", "value")
    val r = graft.events.EventFeatures.ltvCurves(ev)
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .sortBy(_._2)
    r shouldBe Array(
      ("2024-01-01", 0L, 2L, 30.0, 30.0, 15.0),
      ("2024-01-01", 1L, 2L, 6.0, 36.0, 18.0))
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "growthAccounting (W18)"

  it should "classify new/retained/resurrected and land churn on the missing week" in {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // u1: weeks 1,2,4 (retained w2, absent w3 -> churn on w3,
    //     resurrected w4, churn again after w4 -> w5)
    // u2: week 2 only (new w2, churn w3)
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00")), (1L, ts("2024-01-08 09:00:00")),
      (1L, ts("2024-01-22 09:00:00")),
      (2L, ts("2024-01-10 09:00:00")))
      .toDF("user_id", "ts")
    val r = graft.events.EventFeatures.growthAccounting(ev)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    r("2024-01-01") shouldBe (("2024-01-01", 1L, 1L, 0L, 0L, 0L))
    r("2024-01-08") shouldBe (("2024-01-08", 2L, 1L, 1L, 0L, 0L))
    // w3 (Jan 15): nobody active, u1 AND u2 churned
    r("2024-01-15") shouldBe (("2024-01-15", 0L, 0L, 0L, 0L, 2L))
    r("2024-01-22") shouldBe (("2024-01-22", 1L, 0L, 0L, 1L, 0L))
    // trailing churn week after the data ends
    r("2024-01-29") shouldBe (("2024-01-29", 0L, 0L, 0L, 0L, 1L))
    r.size shouldBe 5
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "gapQuantiles (E22)"

  it should "pick type-1 quantiles of hand-computed same-type gaps" in {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1 type A at +0/+10/+30/+100s -> gaps {10, 20, 70};
    // a type-B event in between must NOT split the A-gaps
    val ev = Seq(
      (1L, "A", ts("2024-01-05 10:00:00"), 1L),
      (1L, "B", ts("2024-01-05 10:00:05"), 2L),
      (1L, "A", ts("2024-01-05 10:00:10"), 3L),
      (1L, "A", ts("2024-01-05 10:00:30"), 4L),
      (1L, "A", ts("2024-01-05 10:01:40"), 5L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val r = graft.events.EventFeatures.gapQuantiles(ev)
      .filter(col("event_type") === "A")
      .select(col("quantile"), col("value"))
      .as[(String, Long)].collect().toMap
    r shouldBe Map("p25" -> 10L, "p50" -> 20L, "p75" -> 70L,
      "p90" -> 70L)
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "touchAttribution (W17)"

  it should "credit hand-computed first/last touches, window them, and bucket organic as (none)" in {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // conversion 1: view -> click -> purchase(10): first view, last click
      (1L, "view", ts("2024-01-05 10:00:00"), 1L, 0.0),
      (1L, "click", ts("2024-01-05 10:05:00"), 2L, 0.0),
      (1L, "purchase", ts("2024-01-05 10:10:00"), 3L, 10.0),
      // conversion 2: the only touch is 2 days earlier -> out of window
      (2L, "view", ts("2024-01-01 09:00:00"), 4L, 0.0),
      (2L, "purchase", ts("2024-01-03 10:00:00"), 5L, 7.0))
      .toDF("user_id", "event_type", "ts", "event_id", "value")
    val r = graft.events.EventFunctions.touchAttribution(ev, "purchase",
        Seq("view", "click"), windowSec = 86400)
      .as[(String, String, Long, Double)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    r(("first", "view")) shouldBe ((1L, 10.0))
    r(("last", "click")) shouldBe ((1L, 10.0))
    r(("first", "(none)")) shouldBe ((1L, 7.0))
    r(("last", "(none)")) shouldBe ((1L, 7.0))
    r.size shouldBe 4
    graft.util.Caches.releaseAll(spark)
  }

  it should "exclude touches in the conversion's own second (strictly-earlier semantics)" in {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, "click", ts("2024-01-05 10:00:00"), 1L, 0.0),
      (1L, "purchase", ts("2024-01-05 10:00:00"), 2L, 5.0))
      .toDF("user_id", "event_type", "ts", "event_id", "value")
    val r = graft.events.EventFunctions.touchAttribution(ev, "purchase",
        Seq("view", "click"), windowSec = 3600)
      .select(col("touch_type")).as[String].collect().toSet
    r shouldBe Set("(none)")
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "landingExitReport (W16)"

  it should "build the hand-computed landing/exit matrix with bounces and shares" in {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: [view, click, purchase] then a lone [view] bounce;
    // user 2: a lone [click] bounce -> 3 sessions total
    val ev = Seq(
      (1L, "view", ts("2024-01-05 10:00:00"), 1L),
      (1L, "click", ts("2024-01-05 10:10:00"), 2L),
      (1L, "purchase", ts("2024-01-05 10:20:00"), 3L),
      (1L, "view", ts("2024-01-05 15:00:00"), 4L),
      (2L, "click", ts("2024-01-05 09:00:00"), 5L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val r = graft.events.EventFunctions.landingExitReport(ev, 3600)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5, t._6))).toMap
    r(("view", "purchase")) shouldBe ((1L, 0L, 3L, 1.0 / 3))
    r(("view", "view")) shouldBe ((1L, 1L, 1L, 1.0 / 3))
    r(("click", "click")) shouldBe ((1L, 1L, 1L, 1.0 / 3))
    r.size shouldBe 3
    graft.util.Caches.releaseAll(spark)
  }

  it should "break first/last ties at the same timestamp by event id" in {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, "b_click", ts("2024-01-05 10:00:00"), 2L),
      (1L, "a_view", ts("2024-01-05 10:00:00"), 1L),
      (1L, "c_buy", ts("2024-01-05 10:00:00"), 3L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val r = graft.events.EventFunctions.landingExitReport(ev, 3600)
      .select(col("landing"), col("exit")).as[(String, String)]
      .collect()
    r shouldBe Array(("a_view", "c_buy"))
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "burstiness (E29)"

  it should "match the hand-computed Goh-Barabasi parameter and NULL the n<2 rows" in {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: purchases at +0s, +10s, +30s -> gaps (10, 20):
      // mu=15, sigma=sqrt((100+400)/2 - 225)=5, cv=1/3, B=-0.5
      (1L, "purchase", ts("2024-01-01 00:00:00"), 1L),
      (1L, "purchase", ts("2024-01-01 00:00:10"), 2L),
      (1L, "purchase", ts("2024-01-01 00:00:30"), 3L),
      // user 2: one gap -> mean only, cv/B NULL
      (2L, "purchase", ts("2024-01-01 00:00:00"), 4L),
      (2L, "purchase", ts("2024-01-01 00:01:40"), 5L),
      // user 3: single purchase -> no gap rows, absent
      (3L, "purchase", ts("2024-01-01 00:00:00"), 6L),
      // other event types never counted
      (1L, "view", ts("2024-01-01 00:00:05"), 7L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val r = graft.events.EventFeatures.burstiness(ev, "purchase")
      .as[(Long, Long, Double, Option[Double], Option[Double])]
      .collect().map(t => t._1 -> t).toMap
    r.keySet shouldBe Set(1L, 2L)
    r(1L)._2 shouldBe 2L
    r(1L)._3 shouldBe 15.0
    r(1L)._4.get shouldBe (1.0 / 3) +- 1e-15
    r(1L)._5.get shouldBe -0.5 +- 1e-15
    r(2L) shouldBe ((2L, 1L, 100.0, None, None))
    graft.util.Caches.releaseAll(spark)
  }

  it should "be invariant to input partitioning" in {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rnd = new scala.util.Random(11)
    val ev = (1 to 400).map { i =>
      (rnd.nextInt(12).toLong, "purchase",
        ts(f"2024-01-${1 + rnd.nextInt(27)}%02d " +
          f"${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"),
        i.toLong)
    }.toDF("user_id", "event_type", "ts", "event_id")
    val a = graft.events.EventFeatures.burstiness(ev.coalesce(1), "purchase")
      .orderBy("user_id").collect()
    val b = graft.events.EventFeatures
      .burstiness(ev.repartition(13), "purchase")
      .orderBy("user_id").collect()
    a shouldBe b
    graft.util.Caches.releaseAll(spark)
  }
}
