package graft

import graft.graph.EntityResolution

class GraphSpec extends SparkSpec {
  import spark.implicits._

  it should "find connected components across chains" in {
    // two components: {a,b,c,d} chained, {x,y}
    val edges = Seq(("b", "a"), ("b", "c"), ("c", "d"), ("x", "y"))
      .toDF("src", "dst")
    val cc = EntityResolution.connectedComponents(edges, "src", "dst")
      .as[(String, String)].collect().toMap
    cc shouldBe Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
      "x" -> "x", "y" -> "x")
  }

  it should "match a union-find reference on random graphs" in {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 10
      val edges = (1 to n).map { _ =>
        (s"v${rnd.nextInt(n)}", s"v${rnd.nextInt(n)}")
      }.filter { case (a, b) => a != b }
      // plain Scala union-find over the same edge set
      val parent = scala.collection.mutable.Map.empty[String, String]
      def find(v: String): String = {
        val p = parent.getOrElseUpdate(v, v)
        if (p == v) v else { val r = find(p); parent(v) = r; r }
      }
      def union(a: String, b: String): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra) = rb
      }
      edges.foreach { case (a, b) => union(a, b) }
      val verts = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      val expected = verts
        .groupBy(find)
        .flatMap { case (_, vs) => vs.map(_ -> vs.min) }
      val got = EntityResolution
        .connectedComponents(edges.toDF("src", "dst"), "src", "dst")
        .as[(String, String)].collect().toMap
      got shouldBe expected
    }
  }

  it should "close a 300-vertex chain within the default iteration budget (pointer jumping)" in {
    // plain min-label propagation moves the minimum one hop per round and
    // would need ~300 rounds; pointer jumping compresses label chains so
    // ~log2(300) rounds suffice — this is the deep near-dup-chain shape a
    // boilerplate-heavy corpus feeds into nearDuplicateClusters
    val edges = (1L until 300L).map(i => (s"v%03d".format(i), s"v%03d".format(i + 1)))
      .toDF("src", "dst")
    val cc = EntityResolution.connectedComponents(edges, "src", "dst")
      .as[(String, String)].collect()
    cc.length shouldBe 300
    cc.map(_._2).distinct shouldBe Array("v001")
    graft.util.Caches.releaseAll(spark)
  }

  it should "resolve ids through the component honouring confidence" in {
    val mapping = Seq(
      ("e:1", "p:9", 1.0),
      ("e:2", "p:8", 0.2), // below threshold -> unresolved
      ("e:3", "c:3", 1.0), ("c:3", "p:7", 0.9)) // two hops
      .toDF("src", "dst", "confidence")
    val r = EntityResolution.resolve(mapping, "src", "dst", "confidence",
      minConfidence = 0.5, fromType = "e", toType = "p")
      .as[(String, Option[String])].collect().toMap
    r("e:1") shouldBe Some("p:9")
    r("e:3") shouldBe Some("p:7")
    r.get("e:2").flatten shouldBe None
  }

  behavior of "PageRank (X83)"

  it should "give a uniform rank on a cycle and conserve total mass" in {
    import spark.implicits._
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val pr = graft.graph.PageRank.pageRank(cyc, "s", "d", 0.85, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    pr.values.foreach(_ shouldBe (1.0 / 3) +- 1e-12)
    pr.values.sum shouldBe 1.0 +- 1e-9
    graft.util.Caches.releaseAll(spark)
  }

  it should "rank a star's center above its leaves and absorb dangling mass" in {
    import spark.implicits._
    // leaves 1..5 -> center 99; the center has NO out-edges (dangling)
    val star = (1L to 5L).map(i => (i, 99L)).toDF("s", "d")
    val pr = graft.graph.PageRank.pageRank(star, "s", "d", 0.85, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val leaves = (1L to 5L).map(pr)
    leaves.foreach(l => pr(99L) should be > l * 2)
    // dangling redistribution keeps the distribution normalized
    pr.values.sum shouldBe 1.0 +- 1e-9
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "weightedPageRank (X97)"

  it should "reduce to uniform PageRank under equal weights" in {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("s", "d")
    val ew = e.withColumn("w",
      org.apache.spark.sql.functions.lit(7.0))
    val a = graft.graph.PageRank.pageRank(e, "s", "d", 0.85, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = graft.graph.PageRank
      .weightedPageRank(ew, "s", "d", "w", 0.85, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    a.keySet shouldBe b.keySet
    a.foreach { case (k, v) => b(k) shouldBe v +- 1e-12 }
    graft.util.Caches.releaseAll(spark)
  }

  it should "route mass along heavy edges and drop non-positive ones" in {
    import spark.implicits._
    // 1 splits 99:1 between 2 and 3; both sink back to 1
    val e = Seq((1L, 2L, 99.0), (1L, 3L, 1.0), (2L, 1L, 1.0),
      (3L, 1L, 1.0)).toDF("s", "d", "w")
    val pr = graft.graph.PageRank
      .weightedPageRank(e, "s", "d", "w", 0.85, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    pr(2L) should be > pr(3L) * 5
    pr.values.sum shouldBe 1.0 +- 1e-9
    // a zero-weight edge behaves as if absent (its target keeps only
    // teleport + dangling inflow); node 4 still appears in the output
    val ez = e.unionByName(Seq((1L, 4L, 0.0)).toDF("s", "d", "w"))
    val przM = graft.graph.PageRank
      .weightedPageRank(ez, "s", "d", "w", 0.85, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    przM.keySet should contain(4L)
    przM(2L) should be > przM(4L)
    przM.values.sum shouldBe 1.0 +- 1e-9
    graft.util.Caches.releaseAll(spark)
  }

  it should "score seed-unreachable nodes exactly zero in personalized PageRank" in {
    import spark.implicits._
    // two disconnected chains: 1->2->3 (seeded at 1) and 10->11 (no seed)
    val e = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("s", "d")
    val seeds = Seq(Tuple1(1L)).toDF("seed")
    val pr = graft.graph.PageRank.personalizedPageRank(e, seeds, "s", "d",
        "seed", 0.85, 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    pr(10L) shouldBe 0.0
    pr(11L) shouldBe 0.0
    pr(1L) should be > 0.0
    pr(2L) should be > 0.0
    pr(3L) should be > 0.0
    // mass conserved: the dangling end (3) returns to the seed
    pr.values.sum shouldBe 1.0 +- 1e-9
    graft.util.Caches.releaseAll(spark)
  }

  it should "compute multi-source BFS hop distances, omitting unreachable nodes" in {
    import spark.implicits._
    // chain 1->2->3->4, cycle back 4->1, plus isolated pair 10->11
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (10L, 11L))
      .toDF("s", "d")
    val seeds = Seq(Tuple1(1L)).toDF("seed")
    val r = graft.graph.Paths.bfsHops(e, "s", "d", seeds, "seed", 10)
      .as[(Long, Long)].collect().toMap
    r shouldBe Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L)
    // two seeds: distances take the minimum over sources
    val r2 = graft.graph.Paths.bfsHops(e, "s", "d",
      Seq(Tuple1(1L), Tuple1(3L)).toDF("seed"), "seed", 10)
      .as[(Long, Long)].collect().toMap
    r2 shouldBe Map(1L -> 0L, 3L -> 0L, 2L -> 1L, 4L -> 1L)
    // maxHops truncates
    val r3 = graft.graph.Paths.bfsHops(e, "s", "d", seeds, "seed", 1)
      .as[(Long, Long)].collect().toMap
    r3 shouldBe Map(1L -> 0L, 2L -> 1L)
    graft.util.Caches.releaseAll(spark)
  }

  it should "relax weighted paths: a lighter longer-hop route beats the direct edge" in {
    import spark.implicits._
    // 1->4 direct costs 10; 1->2->3->4 costs 1+1+1 = 3
    val e = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("s", "d", "w")
    val seeds = Seq(Tuple1(1L)).toDF("seed")
    val r = graft.graph.Paths.weightedDistances(e, "s", "d", "w",
      seeds, "seed", rounds = 6)
      .as[(Long, Long)].collect().toMap
    r shouldBe Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L)
    // bounded rounds: with 1 round only the direct relaxations exist
    val r1 = graft.graph.Paths.weightedDistances(e, "s", "d", "w",
      seeds, "seed", rounds = 1)
      .as[(Long, Long)].collect().toMap
    r1 shouldBe Map(1L -> 0L, 2L -> 1L, 4L -> 10L)
    graft.util.Caches.releaseAll(spark)
  }

  it should "label positives and hash-proposed negatives with no edge leaking into the negatives" in {
    import spark.implicits._
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("s", "d")
    val r = graft.graph.LinkPrediction.negativeSampledPairs(
      e, "s", "d", nNodes = 4L, perNode = 3)
      .as[(Long, Long, Int)].collect()
    val pos = r.filter(_._3 == 1).map(p => (p._1, p._2)).toSet
    val neg = r.filter(_._3 == 0).map(p => (p._1, p._2)).toSet
    pos shouldBe Set((0L, 1L), (1L, 2L), (2L, 3L))
    neg.intersect(pos) shouldBe Set.empty // no edge mislabeled negative
    neg.foreach { case (a, b) => a should be < b } // normalized pairs
    neg should not be empty
    // deterministic: same draw twice
    graft.graph.LinkPrediction.negativeSampledPairs(e, "s", "d", 4L, 3)
      .as[(Long, Long, Int)].collect().toSet shouldBe r.toSet
    graft.util.Caches.releaseAll(spark)
  }

  it should "generate deterministic walks that follow the hash-indexed pick and stop at sinks" in {
    import spark.implicits._
    // node 1 -> {2, 3}; node 2 -> {4}; 3 and 4 are sinks
    val e = Seq((1L, 2L), (1L, 3L), (2L, 4L)).toDF("s", "d")
    val seeds = Seq(Tuple1(1L)).toDF("seed")
    def run() = graft.graph.Paths.randomWalks(e, "s", "d", seeds,
      "seed", length = 5)
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    val walk = run()
    // step 0: at 1. pick = (1*13 + 0*17) % 2 = 1 -> neighbor idx 1 = 3
    walk(0) shouldBe ((1L, 0L, 1L))
    walk(1) shouldBe ((1L, 1L, 3L))
    walk.length shouldBe 2 // 3 is a sink: the walk ends early
    run() shouldBe walk // re-run: bit-identical corpus
    graft.util.Caches.releaseAll(spark)
  }

  it should "score Adamic-Adar pairs exactly on a known wedge graph" in {
    import spark.implicits._
    // star: z=0 adjacent to 1,2,3 (deg 3); plus edge 1-2 (existing).
    // candidate pairs through z: (1,2) existing -> dropped; (1,3), (2,3)
    // get 1/ln(3) from z. Node 1 and 2 have deg 2 -> their wedge (0,?)..
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L)).toDF("s", "d")
    val r = graft.graph.LinkPrediction.adamicAdar(e, "s", "d")
      .as[(Long, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    // (1,3) and (2,3): one shared neighbor z=0, weight 1/ln(3)
    r((1L, 3L))._1 shouldBe 1L
    r((1L, 3L))._2 shouldBe (1.0 / math.log(3.0)) +- 1e-12
    r((2L, 3L))._2 shouldBe (1.0 / math.log(3.0)) +- 1e-12
    // (0,?) pairs: 0-1 wedge through 2 exists but 0-1 is an edge -> gone
    r.keySet should not contain ((0L, 1L))
    r.keySet should not contain ((1L, 2L))
    // hub cap: with maxDegree=2 node 0 (deg 3) cannot center wedges;
    // only deg-2 centers 1 and 2 remain, predicting 0-? pairs are edges
    // already, so everything vanishes
    val capped = graft.graph.LinkPrediction.adamicAdar(e, "s", "d",
      maxDegree = Some(2L))
      .as[(Long, Long, Long, Double)].collect()
    capped.length shouldBe 0
    graft.util.Caches.releaseAll(spark)
  }

  it should "be invariant under input partitioning at round-6" in {
    import spark.implicits._
    val edges = (0L until 120L).flatMap(i =>
      Seq((i, (i * 31 + 7) % 120), (i, (i * 17 + 3) % 120)))
      .filter(e => e._1 != e._2).toDF("s", "d")
    def run(parts: Int) = graft.graph.PageRank.pageRank(
      edges.repartition(parts), "s", "d", 0.85, 5)
      .select(org.apache.spark.sql.functions.col("node"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("pagerank"), 6))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    run(1) shouldBe run(7)
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "EntityResolution.fellegiSunter"

  it should "recover hand-computed m/u log-weights and score unlabeled pairs" in {
    import spark.implicits._
    // one field: 3 of 4 matches agree, 1 of 4 non-matches agrees
    // m = 3.5/5 = 0.7, u = 1.5/5 = 0.3
    val pairs = Seq(
      (1L, Some(1), 1), (2L, Some(1), 1), (3L, Some(1), 1),
      (4L, Some(1), 0),
      (5L, Some(0), 1), (6L, Some(0), 0), (7L, Some(0), 0),
      (8L, Some(0), 0),
      (9L, None, 1), (10L, None, 0)) // unlabeled, still scored
      .toDF("pid", "label", "f_agree")
    val r = graft.graph.EntityResolution.fellegiSunter(pairs,
      Seq("f_agree"), "label", threshold = 0.5)
      .select("pid", "score", "classified")
      .as[(Long, Double, Int)].collect().map(t => t._1 -> t).toMap
    val wAgree = math.log(0.7 / 0.3)
    val wDis = math.log(0.3 / 0.7)
    r(1L)._2 shouldBe math.floor(wAgree * 1e6 + 0.5) / 1e6
    r(6L)._2 shouldBe math.floor(wDis * 1e6 + 0.5) / 1e6 +- 1e-12
    r(9L)._2 shouldBe r(1L)._2 // unlabeled pairs get the same weights
    r(1L)._3 shouldBe 1        // ln(7/3) = 0.847 >= 0.5
    r(6L)._3 shouldBe 0
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "EntityResolution.blockingQuality"

  it should "compute hand reduction ratio and pair completeness, orientation-proof" in {
    import spark.implicits._
    // 5 records -> 10 possible pairs; candidates {1-2, 3-4} (with a
    // reversed duplicate), truth {1-2, 4-5}
    val cand = Seq((1L, 2L), (3L, 4L), (2L, 1L)).toDF("a", "b")
    val truth = Seq((2L, 1L), (4L, 5L)).toDF("a", "b")
    val r = graft.graph.EntityResolution.blockingQuality(cand, truth,
      "a", "b", nRecords = 5)
      .select("n_candidates", "n_truth", "n_hit", "reduction_ratio",
        "pair_completeness")
      .as[(Long, Long, Long, Double, Double)].head()
    r shouldBe ((2L, 2L, 1L, 0.8, 0.5))
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Communities.graphShapeReport (X184)"

  it should "read a star as disassortative and score reciprocity exactly" in {
    def shape(edges: Seq[(Long, Long)]) =
      graft.graph.Communities.graphShapeReport(
        edges.toDF("src", "dst"), "src", "dst")
        .as[(Long, Long, Long, Option[Double], Option[Double])]
        .collect().head
    // one-way hub star 0 -> {1,2,3}: zero reciprocity; symmetrized
    // degree pairs are (3,1)x3 and (1,3)x3 -> Pearson exactly -1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    shape(star) shouldBe ((4L, 3L, 0L, Some(0.0), Some(-1.0)))
    // the same star with every reverse edge: reciprocity 1, same mixing
    shape(star ++ star.map(_.swap)) shouldBe
      ((4L, 6L, 6L, Some(1.0), Some(-1.0)))
    // a 4-cycle is 2-regular: no degree variance -> NULL assortativity
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    shape(cyc ++ cyc.map(_.swap)) shouldBe
      ((4L, 8L, 8L, Some(1.0), None))
    // self-loops and duplicate directed edges are dropped before counts
    shape(star ++ Seq((0L, 1L), (2L, 2L))) shouldBe
      ((4L, 3L, 0L, Some(0.0), Some(-1.0)))
    // partition invariance
    val big = (1L to 60L).map(i => (i, i % 7 + 100L))
    graft.graph.Communities.graphShapeReport(
      big.toDF("src", "dst").repartition(13), "src", "dst")
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().head shouldBe
      graft.graph.Communities.graphShapeReport(
        big.toDF("src", "dst").coalesce(1), "src", "dst")
        .as[(Long, Long, Long, Option[Double], Option[Double])]
        .collect().head
    graft.util.Caches.releaseAll(spark)
  }
}
