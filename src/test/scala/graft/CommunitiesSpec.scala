package graft

import graft.graph.Communities
import org.apache.spark.sql.functions._

class CommunitiesSpec extends SparkSpec {
  import spark.implicits._

  behavior of "labelPropagation"

  it should "separate two triangles joined by a bridge" in {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
      .toDF("src", "dst")
    val got = Communities.labelPropagation(edges, "src", "dst",
        iterations = 4)
      .as[(Long, Long)].collect().toMap
    got.keySet shouldBe Set(1L, 2L, 3L, 10L, 11L, 12L)
    // each triangle converges to one label; the bridge doesn't merge them
    got(1L) shouldBe got(2L)
    got(2L) shouldBe got(3L)
    got(10L) shouldBe got(11L)
    got(11L) shouldBe got(12L)
    got(1L) should not be got(10L)
    graft.util.Caches.releaseAll(spark)
  }

  it should "break frequency ties by the smallest label" in {
    // star: center 0 sees labels {1,2,3} all once -> adopts 1
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val got = Communities.labelPropagation(edges, "src", "dst",
        iterations = 1)
      .as[(Long, Long)].collect().toMap
    got(0L) shouldBe 1L
    // every leaf's only neighbour is the center
    got(1L) shouldBe 0L
    got(2L) shouldBe 0L
    got(3L) shouldBe 0L
    graft.util.Caches.releaseAll(spark)
  }

  it should "treat the graph as undirected and ignore self-loops and parallel edges" in {
    // direction, duplicates, and a self-loop must not change the result
    val base = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val noisy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (2L, 3L), (3L, 3L))
      .toDF("src", "dst")
    val a = Communities.labelPropagation(base, "src", "dst", 3)
      .as[(Long, Long)].collect().toSet
    val b = Communities.labelPropagation(noisy, "src", "dst", 3)
      .as[(Long, Long)].collect().toSet
    a shouldBe b
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "hits"

  it should "converge to the uniform split on a complete bipartite hub/authority graph" in {
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L))
      .toDF("src", "dst")
    val got = Communities.hits(edges, "src", "dst", iterations = 3)
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    got(10L)._1 shouldBe 0.5 +- 1e-12 // authorities
    got(11L)._1 shouldBe 0.5 +- 1e-12
    got(1L)._2 shouldBe 0.5 +- 1e-12 // hubs
    got(2L)._2 shouldBe 0.5 +- 1e-12
    got(1L)._1 shouldBe 0.0 // hubs have no in-links
    got(10L)._2 shouldBe 0.0 // authorities have no out-links
    graft.util.Caches.releaseAll(spark)
  }

  it should "keep both scores L1-normalized and rank the better-cited authority higher" in {
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L),
      (3L, 10L)).toDF("src", "dst")
    val rows = Communities.hits(edges, "src", "dst", iterations = 5)
      .as[(Long, Double, Double)].collect()
    rows.map(_._2).sum shouldBe 1.0 +- 1e-9
    rows.map(_._3).sum shouldBe 1.0 +- 1e-9
    val m = rows.map(r => r._1 -> ((r._2, r._3))).toMap
    m(10L)._1 should be > m(11L)._1 // 10 has the extra citation
    m(1L)._2 should be > m(3L)._2 // 1 points at both; 3 only at 10
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "degreePowerLaw (X121)"

  it should "report the exact star-graph distribution and the CSN alpha" in {
    // K1,5: hub degree 5 (1 node), leaves degree 1 (5 nodes)
    val star = (2L to 6L).map(i => (1L, i)).toDF("src", "dst")
    val rows = Communities.degreePowerLaw(star, "src", "dst", dMin = 2)
      .as[(Long, Long, Double, Double, Long, Long, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    rows(1L)._2 shouldBe 5L
    rows(1L)._3 shouldBe 5.0 / 6 // share
    rows(1L)._4 shouldBe 1.0     // ccdf: all nodes have degree >= 1
    rows(5L)._2 shouldBe 1L
    rows(5L)._4 shouldBe 1.0 / 6
    // tail = the hub alone: alpha = 1 + 1/ln(5/2)
    val alpha = 1.0 + 1.0 / math.log(2.5)
    rows(1L)._7.get shouldBe alpha +- 1e-6
    rows(1L)._6 shouldBe 1L // n_tail
    graft.util.Caches.releaseAll(spark)
  }

  it should "yield NULL alpha when the tail has zero ln-mass" in {
    // triangle: every degree = 2 = dMin -> Σ c·ln(d/dMin) = 0
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = Communities.degreePowerLaw(tri, "src", "dst", dMin = 2)
      .select(col("alpha")).as[Option[Double]].collect()
    r.foreach(_ shouldBe None)
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "kCore"

  it should "peel a tail off a K4 and keep the core" in {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("src", "dst")
    Communities.kCore(edges, "src", "dst", k = 3)
      .as[Long].collect().sorted.toSeq shouldBe Seq(1L, 2L, 3L, 4L)
    graft.util.Caches.releaseAll(spark)
  }

  it should "cascade a path graph to an empty 2-core across rounds" in {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    Communities.kCore(path, "src", "dst", k = 2).count() shouldBe 0L
    // the cycle closes the path: every node keeps 2 neighbours
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (4L, 5L), (5L, 1L)).toDF("src", "dst")
    Communities.kCore(cycle, "src", "dst", k = 2)
      .count() shouldBe 5L
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "triangleCounts"

  it should "count hand-checked triangles and coefficients" in {
    // K4 on {1,2,3,4}: every node is in C(3,2)=3 triangles, coef 1;
    // pendant 5-1: node 5 has deg 1 -> 0 triangles, coef 0 by
    // convention; node 1's deg rises to 4 -> coef 2*3/(4*3) = 0.5
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val edges = (k4 :+ ((1L, 5L))).toDF("src", "dst")
    val got = Communities.triangleCounts(edges, "src", "dst")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    got(1L) shouldBe ((3L, 0.5))
    got(2L) shouldBe ((3L, 1.0))
    got(3L) shouldBe ((3L, 1.0))
    got(4L) shouldBe ((3L, 1.0))
    got(5L) shouldBe ((0L, 0.0))
    graft.util.Caches.releaseAll(spark)
  }

  it should "count each triangle once regardless of edge direction and duplication" in {
    // one triangle fed as mixed directions + duplicates + a self-loop
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 2L), (1L, 3L), (3L, 3L),
      (1L, 2L)).toDF("src", "dst")
    val got = Communities.triangleCounts(edges, "src", "dst")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
    graft.util.Caches.releaseAll(spark)
  }

  it should "find no triangles in a tree or cycle of length 4" in {
    val tree = Seq((1L, 2L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    Communities.triangleCounts(tree, "src", "dst")
      .agg(sum(col("n_triangles"))).as[Long].head() shouldBe 0L
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    Communities.triangleCounts(c4, "src", "dst")
      .agg(sum(col("n_triangles"))).as[Long].head() shouldBe 0L
    graft.util.Caches.releaseAll(spark)
  }

  it should "be invariant under input partitioning (both operators)" in {
    val rnd = new scala.util.Random(11)
    val edges = (1 to 300).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    def lpa(parts: Int) = Communities.labelPropagation(
      edges.repartition(parts), "src", "dst", 3)
      .as[(Long, Long)].collect().toSet
    lpa(1) shouldBe lpa(13)
    def hit(parts: Int) = Communities.hits(
        edges.repartition(parts), "src", "dst", 3)
      .select(col("node"), round(col("authority"), 9),
        round(col("hub"), 9))
      .as[(Long, Double, Double)].collect().toSet
    hit(1) shouldBe hit(13)
    graft.util.Caches.releaseAll(spark)
  }

  "modularity (X113)" should "score a two-triangle bridge graph exactly and zero a single community" in {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // triangles {1,2,3} and {4,5,6} bridged by 3-4: m = 7
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("s", "d")
    val twoCommunities = Seq((1L, "A"), (2L, "A"), (3L, "A"),
      (4L, "B"), (5L, "B"), (6L, "B")).toDF("node", "community")
    val q = graft.graph.Communities.modularity(e, "s", "d",
        twoCommunities, "node", "community")
      .select(col("community"), col("n_nodes"), col("e_in"),
        col("d_tot"), col("q_c"))
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    q("A")._2 shouldBe 3L
    q("A")._3 shouldBe 3L
    q("A")._4 shouldBe 7L
    q("A")._5 shouldBe (3.0 / 7 - 0.25) +- 1e-15
    q("B")._5 shouldBe (3.0 / 7 - 0.25) +- 1e-15
    // everything in one community: Q = m/m - (2m/2m)^2 = 0 exactly
    val one = twoCommunities.withColumn("community",
      org.apache.spark.sql.functions.lit("all"))
    val q1 = graft.graph.Communities.modularity(e, "s", "d", one,
      "node", "community").select(col("q_c")).as[Double].head()
    q1 shouldBe 0.0
    graft.util.Caches.releaseAll(spark)
  }
}
