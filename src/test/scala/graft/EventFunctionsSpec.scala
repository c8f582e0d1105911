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
}
