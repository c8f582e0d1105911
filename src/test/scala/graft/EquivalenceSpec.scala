package graft

import org.apache.spark.sql.functions._

class EquivalenceSpec extends SparkSpec {
  import spark.implicits._

  behavior of "dq.Stats.tostEquivalence / mdeTable, events.Resample.crossCorrelation"

  it should "declare tight arms equivalent and match the fixture" in {
    val rows = Seq(9.0, 10.0, 11.0, 10.0, 10.0).map((0, _)) ++
      Seq(10.0, 10.5, 11.0, 10.5, 10.5).map((1, _))
    val df = rows.toDF("arm", "v")
    val r = graft.dq.Stats.tostEquivalence(df, col("arm"), col("v"),
      delta = 2.0)
      .select(col("diff"), col("se"), col("z_lower"), col("z_upper"),
        col("p_equiv"), col("equivalent"))
      .as[(Double, Option[Double], Option[Double], Option[Double],
        Option[Double], Option[Int])].collect().head
    r._1 shouldBe 0.5 +- 1e-9
    r._2.get shouldBe 0.353553 +- 1e-9
    r._3.get shouldBe 7.071068 +- 1e-9
    r._4.get shouldBe 4.242641 +- 1e-9
    r._5.get shouldBe 1.1e-5 +- 1e-9
    r._6.get shouldBe 1
  }

  it should "refuse equivalence when the effect exceeds the margin" in {
    // diff = 5 with delta = 2: z_upper is large NEGATIVE -> p_hi ~ 1
    val rows = (1 to 20).map(i => (0, 10.0 + (i % 3))) ++
      (1 to 20).map(i => (1, 15.0 + (i % 3)))
    val r = graft.dq.Stats.tostEquivalence(rows.toDF("arm", "v"),
      col("arm"), col("v"), delta = 2.0)
      .select(col("equivalent")).as[Option[Int]].collect().head
    r.get shouldBe 0
  }

  it should "match the closed-form MDE fixture" in {
    val rows = (1 to 2000).map(i =>
      ("seg", i % 2, if (i <= 200) 1 else 0))
    val r = graft.dq.Stats.mdeTable(rows.toDF("g", "v", "y"), Seq("g"),
      col("v"), col("y"))
      .select(col("pooled_rate"), col("mde_abs"), col("mde_rel"))
      .as[(Option[Double], Option[Double], Option[Double])]
      .collect().head
    r._1.get shouldBe 0.1 +- 1e-9
    r._2.get shouldBe 0.037587 +- 1e-9
    r._3.get shouldBe 0.375872 +- 1e-9
  }

  it should "find a planted one-day lead at exactly lag +1" in {
    // y on day d+1 mirrors x on day d: correlate (x_t, y_{t+l}) peaks
    // at l = +1 with r = 1
    val xs = Seq(5.0, 9.0, 2.0, 7.0, 4.0, 8.0, 3.0, 6.0, 1.0, 9.5)
    val ev = xs.zipWithIndex.flatMap { case (v, i) =>
      Seq(("purchase", i, v), ("error", i + 1, v * 2.0 + 1.0))
    }.map { case (t, day, v) =>
      (t, java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00"),
        v)
    }.toDF("event_type", "ts", "value")
    val r = graft.events.Resample.crossCorrelation(ev, col("ts"),
      when(col("event_type") === "purchase", col("value")),
      when(col("event_type") === "error", col("value")), maxLag = 3)
      .orderBy(col("lag"))
      .as[(Int, Long, Option[Double])].collect()
    val at1 = r.find(_._1 == 1).get
    at1._3.get shouldBe 1.0 +- 1e-6
    // and the zero-lag correlation is NOT the peak
    val at0 = r.find(_._1 == 0).get
    at0._3.get should be < 1.0
  }
}
