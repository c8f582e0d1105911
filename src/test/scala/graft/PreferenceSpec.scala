package graft

import org.apache.spark.sql.functions._

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  behavior of "Preference.bradleyTerry (X166)"

  it should "solve the 2-item duel exactly (integer MM fixed point)" in {
    // A beats B 3 times, B beats A once: the BT fixed point is
    // pi_A : pi_B = 3 : 1; normalized to sum 2e9 -> 1.5e9 / 5e8,
    // reached exactly at iteration 1 and stable thereafter
    val comps = (Seq.fill(3)(("A", "B")) ++ Seq(("B", "A")))
      .toDF("w", "l")
    val r = graft.ml.Preference.bradleyTerry(comps, col("w"), col("l"),
        iterations = 10)
      .orderBy(col("item"))
      .as[(String, Long, Long, Long, Double)].collect()
    r shouldBe Array(
      ("A", 3L, 4L, 1500000000L, 1.5),
      ("B", 1L, 4L, 500000000L, 0.5))
  }

  it should "pin a never-winning item at strength 0 and order a transitive triple" in {
    // A > B (2-0), B > C (2-0): C never wins -> strength exactly 0;
    // A must outrank B
    val comps = Seq(("A", "B"), ("A", "B"), ("B", "C"), ("B", "C"))
      .toDF("w", "l")
    val r = graft.ml.Preference.bradleyTerry(comps, col("w"), col("l"))
      .orderBy(col("strength_scaled").desc)
      .as[(String, Long, Long, Long, Double)].collect()
    r.map(_._1) shouldBe Array("A", "B", "C")
    r(2)._4 shouldBe 0L
    r(0)._4 should be > r(1)._4
  }

  it should "be partition-invariant (the aggregate is the only distributed step)" in {
    val comps = (1 to 200).map { i =>
      val a = s"m${i % 5}"; val b = s"m${(i * 3 + 1) % 5}"
      if (a < b) (a, b) else (b, a)
    }.filter(t => t._1 != t._2).toDF("w", "l")
    def run(parts: Int) =
      graft.ml.Preference.bradleyTerry(comps.repartition(parts),
        col("w"), col("l")).orderBy(col("item"))
        .as[(String, Long, Long, Long, Double)].collect().toSeq
    run(2) shouldBe run(7)
  }

  it should "survive floor-renormalized zero-strength pairs (no divide by zero)" in {
    // w_a/w_b ~ 1e10 > k·S = 4e9, so b's renormalized strength floors
    // to 0 after iteration 1; same for d. b and d share a pair, so
    // p(b)+p(d) = 0 — the unguarded loop threw BigInt ArithmeticException
    // here. The guard skips the dead pair; winners still rank on top.
    val wins = Seq(
      ("a", "b", 10000000000L), ("b", "a", 1L),
      ("c", "d", 10000000000L), ("d", "c", 1L),
      ("b", "d", 1L), ("d", "b", 1L)).toDF("w", "l", "n")
    val r = graft.ml.Preference.bradleyTerryFromPairWins(wins)
      .orderBy(col("item"))
      .as[(String, Long, Long, Long, Double)].collect()
    r.map(_._1) shouldBe Array("a", "b", "c", "d")
    all(r.map(_._4)) should be >= 0L
    r(0)._4 should be > r(1)._4 // a >> b
    r(2)._4 should be > r(3)._4 // c >> d
  }

  it should "fail loud on self-pairs and on too many items" in {
    an[Exception] should be thrownBy
      graft.ml.Preference.bradleyTerry(
        Seq(("A", "A")).toDF("w", "l"), col("w"), col("l")).collect()
    an[IllegalArgumentException] should be thrownBy
      graft.ml.Preference.bradleyTerry(
        (1 to 40).map(i => (s"i$i", s"j$i")).toDF("w", "l"),
        col("w"), col("l"), maxItems = 10)
  }
}
