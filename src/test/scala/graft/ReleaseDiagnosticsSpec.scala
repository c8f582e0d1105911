package graft

import org.apache.spark.sql.functions._

/** F79 positivity + X175 noisy release + X176 HLL overlap — the
  * round-12 governance tier. */
class ReleaseDiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  private def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  behavior of "Matching.positivityReport (F79)"

  it should "flag one-armed strata and count both arms exactly" in {
    // bin 1 (0.1-0.2): 2 treated + 1 control; bin 8: control only
    val df = Seq((1, 0.15), (1, 0.12), (0, 0.18), (0, 0.85), (0, 0.88))
      .toDF("t", "e")
    val r = graft.ml.Matching.positivityReport(df, col("t"), col("e"))
      .orderBy(col("bin"))
      .as[(Long, Double, Double, Long, Long, Double, Boolean)].collect()
    r.length shouldBe 2
    r(0) shouldBe ((1L, 0.1, 0.2, 2L, 1L, q6(2.0 / 3.0), true))
    r(1) shouldBe ((8L, 0.8, q6(0.9), 0L, 2L, 0.0, false))
  }

  it should "fail loud on degenerate propensities like the estimators" in {
    an[IllegalArgumentException] should be thrownBy
      graft.ml.Matching.positivityReport(
        Seq((1, 1.0), (0, 0.5)).toDF("t", "e"), col("t"), col("e"))
  }

  behavior of "Dq.noisyCounts (X175)"

  it should "reproduce the inverse-CDF noise bit-for-bit and respond to the seed" in {
    val df = (1L to 100L).map(i => (s"g${i % 4}", i)).toDF("g", "i")
    val r = graft.dq.Dq.noisyCounts(df, "g", epsilon = 0.5,
        seed = "s1")
      .orderBy(col("g"))
      .as[(String, Long, Double, Double)].collect()
    r.map(_._2).sum shouldBe 100L
    r.foreach { case (g, n, b, noisy) =>
      b shouldBe 2.0
      // replicate: u from first 8 md5 hex of "dp|s1:g", inverse CDF
      val m = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dp|s1:$g".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(m.substring(0, 8), 16).toDouble
      val u = (h + 0.5) / 4294967296.0
      val d = u - 0.5
      val noise = -b * math.signum(d) * math.log(1.0 - 2.0 * math.abs(d))
      noisy shouldBe q6(n.toDouble + noise)
    }
    val other = graft.dq.Dq.noisyCounts(df, "g", 0.5, "s2")
      .orderBy(col("g")).as[(String, Long, Double, Double)].collect()
    other.map(_._4).toSeq should not be r.map(_._4).toSeq
  }

  it should "spread noise wider at smaller epsilon" in {
    val df = (1L to 64L).map(i => (s"g$i", i)).toDF("g", "i")
    def dev(eps: Double) = graft.dq.Dq.noisyCounts(df, "g", eps, "s")
      .select(abs(col("noisy_n") - col("n")))
      .as[Double].collect().sum
    dev(0.1) should be > dev(10.0)
  }

  it should "fail loud on a NULL group (concat_ws would skip it silently)" in {
    val df = Seq(Some("a"), None, Some("b")).toDF("g")
    an[Exception] should be thrownBy
      graft.dq.Dq.noisyCounts(df, "g", 1.0, "s").collect()
  }

  behavior of "Sketches.hllSourceOverlap (X176)"

  it should "audit pairwise overlaps exactly on a hand fixture" in {
    // A = {x,y,z}, B = {y,z,w}, C = {p}: |A∩B| = 2, |A∩C| = |B∩C| = 0
    val rows = Seq(("A", "x"), ("A", "y"), ("A", "z"), ("A", "y"),
      ("B", "y"), ("B", "z"), ("B", "w"), ("C", "p")).toDF("src", "v")
    val r = graft.sketch.Sketches.hllSourceOverlap(rows, "src", "v")
      .orderBy(col("source_a"), col("source_b"))
      .as[(String, String, Long, Long, Long, Boolean)].collect()
    r shouldBe Array(
      ("A", "B", 3L, 3L, 2L, true),
      ("A", "C", 3L, 1L, 0L, true),
      ("B", "C", 3L, 1L, 0L, true))
  }

  it should "hold its audit bound on a larger vocabulary and ignore partitioning" in {
    val rows = (1L to 4000L).map { i =>
      val src = if (i <= 2000) "first" else "second"
      (src, s"t${i % 700}") // both halves sweep all 700 residues
    }.toDF("src", "v")
    def run(parts: Int) = graft.sketch.Sketches
      .hllSourceOverlap(rows.repartition(parts), "src", "v")
      .as[(String, String, Long, Long, Long, Boolean)].collect().toSeq
    val a = run(3)
    a shouldBe run(8)
    a.head._5 shouldBe 700L
    a.head._6 shouldBe true
  }

  behavior of "Dq.wassersteinDrift (D26)"

  it should "move exactly the hand-computed mass" in {
    // ref = {0, 1}, cur = {1}: W1 = 0.5; a pure location shift of d
    // costs exactly d
    val ref = Seq(0.0, 1.0).toDF("v")
    val cur = Seq(1.0).toDF("v")
    val r = graft.dq.Dq.wassersteinDrift(ref, cur, "v")
      .as[(Long, Long, Double)].collect().head
    r shouldBe ((2L, 1L, 0.5))
    val shift = graft.dq.Dq.wassersteinDrift(
      Seq(3.0).toDF("v"), Seq(13.0).toDF("v"), "v")
      .as[(Long, Long, Double)].collect().head
    shift._3 shouldBe 10.0
  }

  it should "be zero on identical samples and partition-invariant" in {
    val a = (1L to 400L).map(i => (i * 7 % 53).toDouble).toDF("v")
    val b = (1L to 300L).map(i => (i * 11 % 53).toDouble + 2.5)
      .toDF("v")
    def w(x: org.apache.spark.sql.DataFrame,
        y: org.apache.spark.sql.DataFrame) =
      graft.dq.Dq.wassersteinDrift(x, y, "v")
        .select(col("w1")).as[Double].collect().head
    w(a, a) shouldBe 0.0
    w(a, b) should be > 0.0
    w(a.repartition(9), b.repartition(4)) shouldBe w(a, b)
  }

  behavior of "Dq.qqDrift (D27)"

  it should "map a pure location shift onto every quantile row" in {
    // cur = ref + 5: every type-1 pick shifts by exactly 5
    val ref = (1L to 10L).map(i => (i, i.toDouble)).toDF("id", "v")
    val cur = (1L to 10L).map(i => (i, i.toDouble + 5.0))
      .toDF("id", "v")
    val r = graft.dq.Dq.qqDrift(ref, cur, "v", "id", bins = 5)
      .orderBy(col("quantile_idx"))
      .as[(Long, Double, Double, Double, Double)].collect()
    r.map(_._1) shouldBe Array(1L, 2L, 3L, 4L)
    r.map(_._3) shouldBe Array(2.0, 4.0, 6.0, 8.0) // ceil-rank picks
    r.map(_._4) shouldBe Array(7.0, 9.0, 11.0, 13.0)
    r.map(_._5).toSet shouldBe Set(5.0)
    r.map(_._2) shouldBe Array(0.2, 0.4, 0.6, 0.8)
  }

  it should "be partition-invariant with zero diff on identical samples" in {
    val a = (1L to 300L).map(i => (i, (i * 13 % 97).toDouble))
      .toDF("id", "v")
    def run(x: org.apache.spark.sql.DataFrame,
        y: org.apache.spark.sql.DataFrame) =
      graft.dq.Dq.qqDrift(x, y, "v", "id")
        .orderBy(col("quantile_idx"))
        .as[(Long, Double, Double, Double, Double)].collect().toSeq
    val same = run(a, a)
    all(same.map(_._5)) shouldBe 0.0
    run(a.repartition(7), a.repartition(3)) shouldBe same
  }

  behavior of "Stats.hbosScores (X177)"

  it should "score thin-bin rows higher with the exact scaled-term arithmetic" in {
    // values 1,1,1,10 in 3 bins: the 10 sits alone -> ln(4/1);
    // the 1s share a 3-count bin -> ln(4/3)
    val df = Seq((1L, 1.0), (2L, 1.0), (3L, 1.0), (4L, 10.0))
      .toDF("id", "x")
    val r = graft.dq.Stats.hbosScores(df, "id",
        Seq("x" -> col("x")), bins = 3)
      .orderBy(col("id")).as[(Long, Double)].collect()
    def term(arg: Double) =
      math.floor(math.log(arg) * 1e9 + 0.5).toLong
    r(0)._2 shouldBe q6(term(4.0 / 3.0).toDouble / 1e9)
    r(3)._2 shouldBe q6(term(4.0).toDouble / 1e9)
    r(3)._2 should be > r(0)._2
  }

  it should "add feature terms, zero out degenerate features, and fail loud on NULLs" in {
    val df = Seq((1L, 1.0, 5.0), (2L, 1.0, 5.0), (3L, 9.0, 5.0))
      .toDF("id", "a", "b")
    // feature b is constant -> contributes ln(1) = 0 for every row
    val one = graft.dq.Stats.hbosScores(df, "id",
      Seq("a" -> col("a")), bins = 2)
      .orderBy(col("id")).as[(Long, Double)].collect()
    val two = graft.dq.Stats.hbosScores(df, "id",
      Seq("a" -> col("a"), "b" -> col("b")), bins = 2)
      .orderBy(col("id")).as[(Long, Double)].collect()
    two shouldBe one
    val withNull = Seq((1L, Some(1.0)), (2L, None)).toDF("id", "a")
    an[Exception] should be thrownBy
      graft.dq.Stats.hbosScores(withNull, "id",
        Seq("a" -> col("a"))).collect()
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Eval.spiegelhalterZ (F80)"

  it should "score perfect calibration at exactly zero and miscalibration away from it" in {
    // p = 0.25 with exactly 1-in-4 positives: every term cancels
    val calibrated = Seq((0.25, 1), (0.25, 0), (0.25, 0), (0.25, 0))
      .toDF("p", "y")
    val z0 = graft.ml.Eval.spiegelhalterZ(calibrated, col("p"),
      col("y")).as[(Long, Double)].collect().head
    z0 shouldBe ((4L, 0.0))
    // all-positive at p = 0.25: replicate the scaled-term arithmetic
    val over = Seq.fill(4)((0.25, 1)).toDF("p", "y")
    val z1 = graft.ml.Eval.spiegelhalterZ(over, col("p"), col("y"))
      .as[(Long, Double)].collect().head._2
    def s9(x: Double) = math.floor(x * 1e9 + 0.5).toLong
    val num = 4L * s9((1.0 - 0.25) * (1.0 - 2.0 * 0.25))
    val den = 4L * s9((1.0 - 2.0 * 0.25) * (1.0 - 2.0 * 0.25) * 0.25 *
      (1.0 - 0.25))
    z1 shouldBe q6((num.toDouble / 1e9) / math.sqrt(den.toDouble / 1e9))
    z1 should be > 0.0
  }

  it should "emit NULL z on a zero-variance board and fail loud out of range" in {
    val degenerate = Seq((1.0, 1), (0.0, 0)).toDF("p", "y")
    graft.ml.Eval.spiegelhalterZ(degenerate, col("p"), col("y"))
      .collect().head.isNullAt(1) shouldBe true
    an[Exception] should be thrownBy
      graft.ml.Eval.spiegelhalterZ(Seq((1.5, 1)).toDF("p", "y"),
        col("p"), col("y")).collect()
  }

  behavior of "Similarity.simplifiedSilhouette (X178)"

  it should "reproduce hand geometry: tight points score high, boundary points low" in {
    val pts = Seq((1L, Seq(1.0f, 0f)), (2L, Seq(9.0f, 0f)),
      (3L, Seq(0.0f, 0f)), (4L, Seq(5.0f, 0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((100L, Seq(0.0f, 0f)), (200L, Seq(10.0f, 0f)))
      .toDF("vec_id", "embedding")
    val r = graft.ann.Similarity.simplifiedSilhouette(pts, "vec_id",
        "embedding", cents, "vec_id", "embedding")
      .orderBy(col("cluster_id"))
      .as[(Long, Long, Double)].collect()
    // cluster 100 holds points 1 (s=8/9), 3 (s=1), 4 (tie at 5 ->
    // assigned to lower id 100, s=0); cluster 200 holds 2 (s=8/9)
    def s9(x: Double) = math.floor(x * 1e9 + 0.5).toLong
    r(0)._1 shouldBe 100L
    r(0)._2 shouldBe 3L
    r(0)._3 shouldBe q6((s9(8.0 / 9.0) + s9(1.0) + s9(0.0)).toDouble /
      1e9 / 3.0)
    r(1) shouldBe ((200L, 1L, q6(s9(8.0 / 9.0).toDouble / 1e9)))
  }

  it should "be partition-invariant and bound the centroid count" in {
    val pts = (1L to 200L).map(i =>
      (i, Seq((i % 17).toFloat, (i % 5).toFloat)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(0.0f, 0f)), (1L, Seq(16.0f, 4f)))
      .toDF("vec_id", "embedding")
    def run(parts: Int) = graft.ann.Similarity.simplifiedSilhouette(
      pts.repartition(parts), "vec_id", "embedding", cents,
      "vec_id", "embedding")
      .orderBy(col("cluster_id"))
      .as[(Long, Long, Double)].collect().toSeq
    run(3) shouldBe run(9)
    an[IllegalArgumentException] should be thrownBy
      graft.ann.Similarity.simplifiedSilhouette(pts, "vec_id",
        "embedding", pts, "vec_id", "embedding", maxCentroids = 10)
  }
}
