package graft

import org.apache.spark.sql.functions._

class CompactionCmhSpec extends SparkSpec {
  import spark.implicits._

  behavior of "relational.Compaction, dq.Stats.cmhTest, ml.Stats.theilSen"

  it should "pack files contiguously into target-size bins" in {
    // sizes 3,3,3,3 at target 5: bins by exclusive prefix 0,0,1,1
    val files = Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L))
      .toDF("id", "sz")
    val plan = graft.relational.Compaction
      .compactionPlan(files, "id", col("sz"), 5L)
      .orderBy(col("bin"))
      .as[(Long, Long, Long, Long, Long)].collect()
    plan shouldBe Array((0L, 2L, 6L, 1L, 2L), (1L, 2L, 6L, 3L, 4L))
    // a huge file lands alone in its own bin; later files continue
    val mixed = Seq((1L, 2L), (2L, 50L), (3L, 2L), (4L, 2L))
      .toDF("id", "sz")
    val p2 = graft.relational.Compaction
      .compactionPlan(mixed, "id", col("sz"), 10L)
      .orderBy(col("bin"))
      .as[(Long, Long, Long, Long, Long)].collect()
    // prefixes: 0,2,52,54 -> bins 0,0,5,5
    p2 shouldBe Array((0L, 2L, 52L, 1L, 2L), (5L, 2L, 4L, 3L, 4L))
  }

  it should "fail loud on a NULL file size" in {
    val files = Seq((1L, Some(3L)), (2L, None)).toDF("id", "sz")
    val ex = intercept[Exception] {
      graft.relational.Compaction
        .compactionPlan(files, "id", col("sz"), 5L).collect()
    }
    ex.getMessage should include("NULL file size")
  }

  it should "match the hand-computed CMH fixture" in {
    // stratum A: n0=10 c0=2 n1=10 c1=5; stratum B: n0=20 c0=4 n1=10 c1=5
    val rows =
      (1 to 10).map(i => ("A", 0, if (i <= 2) 1 else 0)) ++
      (1 to 10).map(i => ("A", 1, if (i <= 5) 1 else 0)) ++
      (1 to 20).map(i => ("B", 0, if (i <= 4) 1 else 0)) ++
      (1 to 10).map(i => ("B", 1, if (i <= 5) 1 else 0))
    val df = rows.toDF("seg", "arm", "conv")
    val r = graft.dq.Stats.cmhTest(df, Seq("seg"), col("arm"),
      col("conv"))
      .as[(Long, Long, Double, Double, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().head
    r._1 shouldBe 2L
    r._2 shouldBe 10L
    r._3 shouldBe 6.5 +- 1e-9
    r._4 shouldBe 2.645644 +- 1e-9
    r._5.get shouldBe 4.630252 +- 1e-9
    r._6.get shouldBe 2.151802 +- 1e-9
    r._7.get shouldBe 0.031413 +- 1e-9
    r._8.get shouldBe 4.0 +- 1e-9
  }

  it should "resist an outlier the way least squares cannot" in {
    // y = 2x + 1 with (5, 100) wild: TS slope stays 2, OLS does not
    val pts = Seq((1, 3), (2, 5), (3, 7), (4, 9), (5, 100))
      .map { case (x, y) => ("g", x.toDouble, y.toDouble) }
      .toDF("g", "x", "y")
    val ts = graft.ml.Stats.theilSen(pts, col("g"), col("x"), col("y"))
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().head
    ts._2 shouldBe 5L
    ts._3 shouldBe 10L
    ts._4.get shouldBe 2.0 +- 1e-9
    ts._5.get shouldBe 1.0 +- 1e-9
    val ols = graft.ml.Stats.groupedOls(pts, Seq("g"), col("y"),
      col("x")).select(col("slope")).as[Option[Double]].collect().head
    ols.get should be > 10.0
  }

  it should "fail loud when a group exceeds the all-pairs cap" in {
    val big = (1 to 30).map(i => ("g", i.toDouble, i.toDouble))
      .toDF("g", "x", "y")
    val ex = intercept[Exception] {
      graft.ml.Stats.theilSen(big, col("g"), col("x"), col("y"),
        maxGroupSize = 10).collect()
    }
    ex.getMessage should include("maxGroupSize")
  }
}
