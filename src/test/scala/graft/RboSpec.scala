package graft

import org.apache.spark.sql.functions._

class RboSpec extends SparkSpec {
  import spark.implicits._

  behavior of "Retrieval.rankBiasedOverlap"

  private def rk(rows: (String, Long, Long)*) =
    rows.toDF("q", "id", "rank")

  it should "score identical rankings 1 and disjoint rankings 0" in {
    val a = rk(("q1", 10L, 1L), ("q1", 20L, 2L), ("q1", 30L, 3L))
    val b = rk(("q1", 10L, 1L), ("q1", 20L, 2L), ("q1", 30L, 3L))
    val same = graft.text.Retrieval
      .rankBiasedOverlap(a, b, "q", "id", "rank", k = 3)
      .select(col("rbo")).as[Double].collect().head
    // truncated RBO@3 of identical lists: (1-p)(p^0 + p^1 + p^2)
    val expect = 0.1 * (1.0 + 0.9 + 0.81)
    same shouldBe expect +- 1e-6
    val c = rk(("q1", 77L, 1L), ("q1", 88L, 2L), ("q1", 99L, 3L))
    val disj = graft.text.Retrieval
      .rankBiasedOverlap(a, c, "q", "id", "rank", k = 3)
      .select(col("n_overlap_k"), col("rbo"))
      .as[(Long, Double)].collect().head
    disj shouldBe (0L, 0.0)
  }

  it should "weight agreement at the top more than at the tail" in {
    val a = rk(("q1", 1L, 1L), ("q1", 2L, 2L), ("q1", 3L, 3L))
    // b1 agrees at rank 1 only; b2 agrees at rank 3 only
    val b1 = rk(("q1", 1L, 1L), ("q1", 8L, 2L), ("q1", 9L, 3L))
    val b2 = rk(("q1", 8L, 1L), ("q1", 9L, 2L), ("q1", 3L, 3L))
    def rbo(b: org.apache.spark.sql.DataFrame) = graft.text.Retrieval
      .rankBiasedOverlap(a, b, "q", "id", "rank", k = 3)
      .select(col("rbo")).as[Double].collect().head
    rbo(b1) should be > rbo(b2)
  }

  it should "emit zero-overlap queries instead of dropping them" in {
    val a = rk(("q1", 1L, 1L), ("q2", 2L, 1L))
    val b = rk(("q1", 1L, 1L), ("q3", 3L, 1L))
    val r = graft.text.Retrieval
      .rankBiasedOverlap(a, b, "q", "id", "rank", k = 2)
      .orderBy(col("q"))
      .as[(String, Long, Double)].collect()
    r.map(_._1).toSeq shouldBe Seq("q1", "q2", "q3")
    r(1)._3 shouldBe 0.0
    r(2)._3 shouldBe 0.0
  }

  it should "fail loud on duplicate (query, id) rows" in {
    val a = rk(("q1", 1L, 1L), ("q1", 1L, 2L))
    val b = rk(("q1", 1L, 1L))
    val ex = intercept[IllegalArgumentException] {
      graft.text.Retrieval.rankBiasedOverlap(a, b, "q", "id", "rank",
        k = 3)
    }
    ex.getMessage should include("duplicate")
  }
}
