package graft

import graft.relational.Ranks
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-phase global-order primitives (prefix sums, global rank,
  * computed ntile) that replace partition-less windows in D5/D7/E12. */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  /** AQE wraps executedPlan in AdaptiveSparkPlanExec and hides the
    * tree from collect{}, so build the frame with static plans. This
    * also catches `Window.partitionBy(lit(1))`: Catalyst folds the
    * literal away, leaving a partition-less WindowExec. */
  private def noGlobalWindow(
      mk: => org.apache.spark.sql.DataFrame): Unit = {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val offenders = mk.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }
      offenders shouldBe empty
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  "Ranks.prefixSums" should "match the global-window cumulative sum under any partitioning" in {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map(i => (i.toLong, rnd.nextInt(50).toLong))
    val expected = rows.sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, _, acc), (id, v)) =>
        (id, v, acc + v) }
      .drop(1).map(t => (t._1, t._3)).toMap
    Seq(
      rows.toDF("id", "v").repartition(1),
      rows.toDF("id", "v").repartition(13),
      rows.reverse.toDF("id", "v").repartition(7, col("v")))
      .foreach { df =>
        val got = Ranks.prefixSums(df, Seq(col("id")), Seq("c" -> col("v")))
          .select(col("id"), col("c")).as[(Long, Long)].collect().toMap
        got shouldBe expected
      }
    graft.util.Caches.releaseAll(spark)
  }

  it should "rank a total order 1..n, honoring desc" in {
    val df = Seq((3L, "c"), (1L, "a"), (2L, "b"), (5L, "e"), (4L, "d"))
      .toDF("k", "s").repartition(3)
    Ranks.globalRank(df, Seq(col("k")), "r")
      .select(col("s"), col("r")).as[(String, Long)].collect().toMap shouldBe
      Map("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 4L, "e" -> 5L)
    Ranks.globalRank(df, Seq(col("k").desc), "r")
      .select(col("s"), col("r")).as[(String, Long)].collect().toMap shouldBe
      Map("e" -> 1L, "d" -> 2L, "c" -> 3L, "b" -> 4L, "a" -> 5L)
    // the primitive itself must only ever window within __pid
    noGlobalWindow(Ranks.globalRank(df, Seq(col("k")), "r"))
    graft.util.Caches.releaseAll(spark)
  }

  "Ranks.ntileOf" should "reproduce the built-in ntile for ragged and exact splits" in {
    for (n <- Seq(4, 5, 7, 23, 100); k <- Seq(2, 5, 7)) {
      val df = (1 to n).map(i => Tuple1(i.toLong)).toDF("r")
      val builtin = df
        .withColumn("b", ntile(k).over(Window.orderBy(col("r"))))
        .select(col("r"), col("b").cast("long"))
        .as[(Long, Long)].collect().toMap
      val computed = df
        .select(col("r"), Ranks.ntileOf(col("r"), n.toLong, k).as("b"))
        .as[(Long, Long)].collect().toMap
      withClue(s"n=$n k=$k: ") { computed shouldBe builtin }
    }
  }

  it should "bucket rank=n into k even when n < k (one row per bucket)" in {
    val df = (1 to 3).map(i => Tuple1(i.toLong)).toDF("r")
    df.select(col("r"), Ranks.ntileOf(col("r"), 3L, 5).as("b"))
      .as[(Long, Long)].collect().toMap shouldBe
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L)
  }

  "D5/D7/E12 plans" should "contain no partition-less WindowExec (the 100 TB one-task sort)" in {
    val rnd = new scala.util.Random(5)
    val ref = (1 to 400).map(i => (i.toLong, rnd.nextGaussian())).toDF("id", "v")
    val cur = (1 to 300).map(i => (i.toLong, rnd.nextGaussian() + 0.3)).toDF("id", "v")
    noGlobalWindow(graft.dq.Dq.psiDrift(ref, cur, "v", "id", bins = 10))
    noGlobalWindow(graft.dq.Dq.ksDrift(ref, cur, "v"))
    noGlobalWindow(graft.dq.Dq.chiSquareDrift(
      ref.withColumn("c", (col("id") % 3).cast("string")),
      cur.withColumn("c", (col("id") % 3).cast("string")), "c"))
    // calibrationCurve is NOT asserted window-free: its two windows run
    // over the nBuckets-row grid join (bounded by construction) — the
    // r10 broadcast-aggregate alternative re-evaluated the perBucket
    // lineage and tripled q_f15. PlanGuardSpec's global-window census
    // pins its exact count (2) with the boundedness justification.
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = (1 to 300).map { i =>
      (rnd.nextInt(40).toLong,
        ts(f"2024-01-${1 + rnd.nextInt(28)}%02d 09:00:00"),
        rnd.nextInt(10000) / 100.0)
    }.toDF("user_id", "ts", "value")
    noGlobalWindow(graft.events.EventFeatures.rfmScores(ev, "2024-02-01"))
    graft.util.Caches.releaseAll(spark)
  }

  it should "keep ksDrift exact: hand-computed two-sample statistic" in {
    // ref {1,2,3,4}, cur {3,4,5,6}: F_ref-F_cur gaps at v=2: 0.5-0=0.5
    val ref = Seq(1.0, 2.0, 3.0, 4.0).map(Tuple1(_)).toDF("v")
    val cur = Seq(3.0, 4.0, 5.0, 6.0).map(Tuple1(_)).toDF("v")
    val r = graft.dq.Dq.ksDrift(ref, cur, "v")
      .as[(Long, Long, Double)].head()
    r shouldBe ((4L, 4L, 0.5))
    graft.util.Caches.releaseAll(spark)
  }
}
