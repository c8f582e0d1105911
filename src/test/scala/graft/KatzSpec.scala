package graft

import org.apache.spark.sql.functions._

class KatzSpec extends SparkSpec {
  import spark.implicits._

  behavior of "PageRank.katzCentrality (X168)"

  it should "propagate exact floor-divided walk mass on a hand chain" in {
    // 1 -> 2 -> 3, alpha = 1/2, 2 iterations, S = 1e9:
    // x1: (S, S+S/2, S+S/2); x2: (S, S + S/2, S + (1.5e9)/2)
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = graft.graph.PageRank.katzCentrality(edges, "src", "dst",
        alphaInverse = 2, iterations = 2)
      .orderBy(col("node"))
      .as[(Long, Long, Double)].collect()
    r.map(t => (t._1, t._2)) shouldBe Array(
      (1L, 1000000000L), (2L, 1500000000L), (3L, 1750000000L))
    r(2)._3 shouldBe 1.75
  }

  it should "credit parallel edges once each (multi-edge semantics)" in {
    // two parallel 1 -> 2 edges: node 2 receives 2 * floor(S/2)
    val edges = Seq((1L, 2L), (1L, 2L)).toDF("src", "dst")
    val r = graft.graph.PageRank.katzCentrality(edges, "src", "dst",
        alphaInverse = 2, iterations = 1)
      .orderBy(col("node"))
      .as[(Long, Long, Double)].collect()
    r.map(t => (t._1, t._2)) shouldBe Array(
      (1L, 1000000000L), (2L, 2000000000L))
  }

  it should "be partition-invariant (exact integer mass, order-free sums)" in {
    val edges = (1L to 120L)
      .map(i => (i % 30, (i * 7 + 3) % 30)).filter(t => t._1 != t._2)
      .toDF("src", "dst")
    def run(parts: Int) =
      graft.graph.PageRank.katzCentrality(edges.repartition(parts),
        "src", "dst", alphaInverse = 8, iterations = 4)
        .orderBy(col("node"))
        .as[(Long, Long, Double)].collect().toSeq
    run(3) shouldBe run(11)
    graft.util.Caches.releaseAll(spark)
  }
}
