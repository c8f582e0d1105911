package graft

import org.apache.spark.sql.functions._

class WilsonMarkovSpec extends SparkSpec {
  import spark.implicits._

  behavior of "dq.Stats.wilsonCi, events.EventFunctions.transitionMatrix, Resample.tsFeatureStrengths"

  it should "match the closed-form Wilson interval and stay inside [0,1] at extremes" in {
    val rows = (1 to 100).map(i => ("seg", if (i <= 10) 1 else 0))
      .toDF("g", "y")
    val r = graft.dq.Stats.wilsonCi(rows, Seq("g"), col("y"))
      .select(col("rate"), col("ci_lo"), col("ci_hi"))
      .as[(Option[Double], Option[Double], Option[Double])]
      .collect().head
    r._1.get shouldBe 0.1 +- 1e-9
    r._2.get shouldBe 0.055229 +- 1e-9
    r._3.get shouldBe 0.174366 +- 1e-9
    // p = 0: Wald collapses to [0,0]; Wilson stays informative
    val zero = (1 to 20).map(_ => ("g", 0)).toDF("g", "y")
    val rz = graft.dq.Stats.wilsonCi(zero, Seq("g"), col("y"))
      .select(col("ci_lo"), col("ci_hi"))
      .as[(Option[Double], Option[Double])].collect().head
    rz._1.get shouldBe 0.0 +- 1e-9
    rz._2.get should be > 0.1
  }

  it should "count transitions exactly and normalize rows to 1" in {
    // u1: a->b->a->c ; u2: a->b
    val ev = Seq(("u1", 1, "a"), ("u1", 2, "b"), ("u1", 3, "a"),
      ("u1", 4, "c"), ("u2", 5, "a"), ("u2", 6, "b"))
      .map { case (u, i, t) =>
        (u, t, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$i%02d"),
          1.0, i.toLong)
      }.toDF("user_id", "event_type", "ts", "value", "event_id")
    val r = graft.events.EventFunctions.transitionMatrix(ev)
      .orderBy(col("from_type"), col("to_type"))
      .as[(String, String, Long, Double)].collect()
    r.map(x => (x._1, x._2, x._3)) shouldBe Array(
      ("a", "b", 2L), ("a", "c", 1L), ("b", "a", 1L))
    r.filter(_._1 == "a").map(_._4).sum shouldBe 1.0 +- 1e-9
    r.filter(_._1 == "b").map(_._4).sum shouldBe 1.0 +- 1e-9
  }

  it should "score a strongly trending series higher on trend than a noisy one" in {
    // 28 daily points: a clean ramp vs alternating noise
    val ramp = (0 until 28).map(i => ("ramp",
      java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"),
      "purchase", 10.0 + i * 5.0))
    val noise = (0 until 28).map(i => ("noise",
      java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"),
      "purchase", if (i % 2 == 0) 10.0 else 90.0))
    val ev = (ramp ++ noise).toDF("user_id", "ts", "event_type", "value")
    val r = graft.events.Resample.tsFeatureStrengths(ev, "user_id",
      col("ts"), col("value"))
      .as[(String, Long, Option[Double], Option[Double])]
      .collect().map(x => x._1 -> x).toMap
    r("ramp")._2 shouldBe 28L
    r("ramp")._3.get should be > 0.95
    r("ramp")._3.get should be > r("noise")._3.get
  }
}
