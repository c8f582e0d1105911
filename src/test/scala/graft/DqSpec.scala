package graft

import graft.dq.Dq
import org.apache.spark.sql.functions._

class DqSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq((1, 10.0), (2, -5.0), (3, 20.0), (4, -1.0))
    .toDF("id", "amount")

  it should "count invalid rows in one pass and apply the threshold" in {
    val r = Dq.assertion(df, "amount > 0", threshold = 0.5)
    r.total shouldBe 4
    r.invalid shouldBe 2
    r.ratio shouldBe 0.5
    r.passed shouldBe true
    r.invalidRows.select("id").as[Int].collect().sorted shouldBe Array(2, 4)
    Dq.assertion(df, "amount > 0", threshold = 0.25).passed shouldBe false
  }

  it should "diff only differing rows with null-safe matches" in {
    val right = Seq((1, 10.0), (2, -6.0), (3, 20.0), (4, -1.0))
      .toDF("id", "amount")
    val d = Dq.diff(df, right, Seq("id"), Seq("amount"))
    d.count() shouldBe 1
    d.select("id", "amount", "amount_right").as[(Int, Double, Double)]
      .head() shouldBe ((2, -5.0, -6.0))
  }

  it should "chain plan commands through the shared context" in {
    val out = Dq.runPlan(spark,
      Seq(Dq.AssertCmd("in1", "amount > 0", 0.9, "a"),
        Dq.ViewCmd("SELECT count(1) AS n FROM a_invalid", "v")),
      Map("in1" -> df))
    out("a").select("invalid").as[Long].head() shouldBe 2L
    out("v").as[Long].head() shouldBe 2L
  }
}
