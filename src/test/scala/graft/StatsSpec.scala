package graft

import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  behavior of "ml.Stats"

  it should "recover a planted linear relationship per group" in {
    // y = 3x + 2 exactly in group a (r2 = 1); pure noise-free constant in
    // group b has zero x-variance -> NULL slope
    val a = (1 to 50).map(i => ("a", i.toDouble, 3.0 * i + 2.0))
    val b = (1 to 10).map(_ => ("b", 5.0, 7.0))
    val df = (a ++ b).toDF("g", "x", "y")
    val r = graft.ml.Stats.groupedOls(df, Seq("g"), col("y"), col("x"))
      .as[(String, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().map(t => t._1 -> t).toMap
    val (_, n, slope, intercept, r2, _) = r("a")
    n shouldBe 50L
    slope.get shouldBe 3.0 +- 1e-12
    intercept.get shouldBe 2.0 +- 1e-12
    r2.get shouldBe 1.0 +- 1e-12
    r("b")._3 shouldBe None // zero x-variance: undefined slope
  }

  it should "target-encode leave-one-out with singleton fallback to the LOO global mean" in {
    val df = Seq(
      ("a", 1.0), ("a", 0.0), ("a", 1.0), // cat a: sum 2, n 3
      ("b", 1.0))                         // singleton
      .toDF("cat", "y")
    val enc = graft.ml.Stats.targetEncodeLoo(df, col("cat"), col("y"))
      .select(col("cat"), col("y"), col("encoded"))
      .as[(String, Double, Double)].collect()
    enc.filter(r => r._1 == "a" && r._2 == 1.0)
      .foreach(_._3 shouldBe 0.5 +- 1e-15)  // (2-1)/2
    enc.filter(r => r._1 == "a" && r._2 == 0.0)
      .foreach(_._3 shouldBe 1.0 +- 1e-15)  // (2-0)/2
    // singleton: global (3-1)/(4-1)
    enc.filter(_._1 == "b").foreach(_._3 shouldBe (2.0 / 3.0) +- 1e-15)
  }

  it should "never leak a row's own label into its encoding" in {
    // two rows with identical category but opposite labels must get
    // DIFFERENT encodings (each sees only the other's label)
    val df = Seq(("c", 1.0), ("c", 0.0)).toDF("cat", "y")
    val e = graft.ml.Stats.targetEncodeLoo(df, col("cat"), col("y"))
      .select(col("y"), col("encoded")).as[(Double, Double)]
      .collect().toMap
    e(1.0) shouldBe 0.0
    e(0.0) shouldBe 1.0
  }

  behavior of "dq.Stats"

  it should "compute the pairwise correlation matrix in one aggregate pass" in {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map { _ =>
      val x = rnd.nextDouble()
      (x, 2.0 * x + 1.0, rnd.nextDouble(), -x)
    }
    val df = rows.toDF("a", "b", "c", "d")
    val m = graft.dq.Stats.correlationMatrix(df, Seq("a", "b", "c", "d"))
    // one pass: the only exchange is the single-row partial-agg gather
    "Exchange".r.findAllIn(m.queryExecution.executedPlan.toString)
      .size shouldBe 1
    val r = m.select(col("col_x"), col("col_y"), col("pearson"))
      .as[(String, String, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    r.size shouldBe 6
    r(("a", "b")) shouldBe 1.0 +- 1e-9   // exact linear
    r(("a", "d")) shouldBe -1.0 +- 1e-9  // exact inverse
    math.abs(r(("a", "c"))) should be < 0.2 // independent
    // cross-check one pair against Spark's native corr
    val native = df.agg(corr(col("a"), col("c"))).as[Double].head()
    r(("a", "c")) shouldBe native +- 1e-9
  }

  it should "bracket the true mean with a deterministic bootstrap CI" in {
    val rnd = new scala.util.Random(19)
    val units = (1 to 500).map(i => (i.toLong, 50.0 + rnd.nextGaussian() * 10))
      .toDF("uid", "x")
    def ci() = graft.dq.Stats.bootstrapMeanCi(units, col("x"), col("uid"))
      .select(col("n_units"), col("point_est"), col("ci_lo"), col("ci_hi"))
      .as[(Long, Double, Double, Double)].head()
    val (n, point, lo, hi) = ci()
    n shouldBe 500L
    lo should be < point
    hi should be > point
    // CI width ~ 4·sigma/sqrt(n) ≈ 1.8; sane bounds
    (hi - lo) should be > 0.5
    (hi - lo) should be < 5.0
    point shouldBe 50.0 +- 2.0
    // deterministic: identical on re-run and under repartitioning
    val again = graft.dq.Stats.bootstrapMeanCi(units.repartition(7),
        col("x"), col("uid"))
      .select(col("ci_lo"), col("ci_hi")).as[(Double, Double)].head()
    again._1 shouldBe lo +- 1e-9
    again._2 shouldBe hi +- 1e-9
  }

  it should "pick exact type-1 group quantiles with integer rank arithmetic" in {
    // group g: values 1..10 -> p25 at rank ceil(2.5)=3, p50 rank 5,
    // p75 rank 8, p90 rank 9
    val df = (1 to 10).map(i => ("g", i.toLong, i.toLong))
      .toDF("grp", "v", "id")
    val r = graft.dq.Stats.groupQuantiles(df, "grp", col("v"), col("id"))
      .select(col("quantile"), col("rank"), col("value"))
      .as[(String, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3)))
      .toMap
    r("p25") shouldBe ((3L, 3L))
    r("p50") shouldBe ((5L, 5L))
    r("p75") shouldBe ((8L, 8L))
    r("p90") shouldBe ((9L, 9L))
  }

  it should "flag a significant conversion lift and stay NULL-safe on degenerate inputs" in {
    // variant 1 converts 80/100, variant 0 converts 20/100: hugely significant
    val units = ((1 to 100).map(i => (0L, if (i <= 20) 1L else 0L)) ++
      (1 to 100).map(i => (1L, if (i <= 80) 1L else 0L)))
      .toDF("variant", "converted")
    val r = graft.dq.Stats.abTest(units, col("variant"), col("converted"))
      .select(col("p0"), col("p1"), col("z"), col("significant"))
      .as[(Double, Double, Double, Int)].head()
    r._1 shouldBe 0.2 +- 1e-15
    r._2 shouldBe 0.8 +- 1e-15
    r._3 should be > 5.0
    r._4 shouldBe 1
    // degenerate: everyone converts -> zero pooled variance -> NULL z
    val all = Seq((0L, 1L), (1L, 1L)).toDF("variant", "converted")
    val d = graft.dq.Stats.abTest(all, col("variant"), col("converted"))
      .select(col("z"), col("significant"))
      .as[(Option[Double], Option[Int])].head()
    d._1 shouldBe None
    d._2 shouldBe None
    // empty arm: NULL rate on the empty side, no ANSI error
    val one = Seq((1L, 1L), (1L, 0L)).toDF("variant", "converted")
    val o = graft.dq.Stats.abTest(one, col("variant"), col("converted"))
      .select(col("p0"), col("z")).as[(Option[Double], Option[Double])]
      .head()
    o._1 shouldBe None
    o._2 shouldBe None
  }

  it should "fail loud on a degenerate bootstrap population instead of vanishing the row" in {
    import spark.implicits._
    // 1 unit: most replicas draw weight 0 -> means missing -> the
    // percentile ranks cannot exist; must throw, not emit 0 rows
    val one = Seq((1.0, "u1")).toDF("x", "uid")
    val ex = intercept[IllegalArgumentException] {
      graft.dq.Stats.bootstrapMeanCi(one, col("x"), col("uid"))
    }
    ex.getMessage should include("replica means")
    graft.util.Caches.releaseAll(spark)
  }

  "giniConcentration (X117)" should "score equality 0, full concentration (n-1)/n, and a hand case" in {
    import spark.implicits._
    def gini(xs: Seq[Long]): Option[Double] =
      graft.dq.Stats.giniConcentration(xs.map(Tuple1(_)).toDF("w"),
          col("w"))
        .select(col("gini")).as[Option[Double]].head()
    gini(Seq(5L, 5L, 5L, 5L)) shouldBe Some(0.0)
    gini(Seq(0L, 0L, 0L, 12L)).get shouldBe 0.75 +- 1e-15 // (n-1)/n
    // {1,2,3,4}: S = 1+4+9+16 = 30, T = 10, n = 4:
    // G = (60 - 5*10)/(4*10) = 0.25
    gini(Seq(3L, 1L, 4L, 2L)).get shouldBe 0.25 +- 1e-15
    gini(Seq(7L)) shouldBe None // n < 2
    intercept[IllegalArgumentException] { gini(Seq(-1L, 3L)) }
    graft.util.Caches.releaseAll(spark)
  }

  it should "be invariant to the order among tied weights (rank-set invariance)" in {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val xs = (1 to 400).map(_ => rnd.nextInt(20).toLong) // heavy ties
    def g(df: org.apache.spark.sql.DataFrame) = graft.dq.Stats
      .giniConcentration(df, col("w")).select(col("gini"))
      .as[Double].head()
    g(xs.map(Tuple1(_)).toDF("w").repartition(1)) shouldBe
      g(xs.reverse.map(Tuple1(_)).toDF("w").repartition(13))
    graft.util.Caches.releaseAll(spark)
  }

  "winsorize (X124)" should "clamp to hand-computed per-group rank cuts and keep every row" in {
    import spark.implicits._
    // group g: values 1..10 -> p10 cut = rank ceil(10/10)=1 -> 1.0;
    // p90 cut = rank ceil(90/10)=9 -> 9.0; so 10 clamps to 9, 1 stays
    val df = (1 to 10).map(i => ("g", i.toDouble, i.toLong))
      .toDF("src", "v", "id")
    val r = graft.dq.Stats.winsorize(df, "src", col("v"), col("id"))
      .as[(String, Long, Double, Double, Double, Double)].collect()
    r.length shouldBe 10
    val m = r.map(t => t._2 -> t._6).toMap
    m(10L) shouldBe 9.0
    m(9L) shouldBe 9.0
    m(1L) shouldBe 1.0 // exactly AT the lo cut: unchanged
    m(5L) shouldBe 5.0
    r.foreach { t => t._4 shouldBe 1.0; t._5 shouldBe 9.0 }
    intercept[IllegalArgumentException] {
      graft.dq.Stats.winsorize(df, "src", col("v"), col("id"),
        lo = (9, 10), hi = (1, 10)) // lo above hi
    }
    // NULL values are excluded BEFORE ranking (Spark sorts them FIRST,
    // DuckDB LAST — inside the rank they silently shift every cut) and
    // from the output
    val withNulls = ((1 to 10).map(i => ("g", Some(i.toDouble),
      i.toLong)) ++ Seq(("g", Option.empty[Double], 99L)))
      .toDF("src", "v", "id")
    val rn = graft.dq.Stats.winsorize(withNulls, "src", col("v"),
      col("id")).as[(String, Long, Double, Double, Double, Double)]
      .collect()
    rn.length shouldBe 10 // the NULL row is not ranked and not emitted
    rn.map(t => t._2 -> t._6).toMap.apply(10L) shouldBe 9.0 // cuts unshifted
    graft.util.Caches.releaseAll(spark)
  }

  "madOutliers (D12)" should "flag only the planted spike via hand-computed median/MAD" in {
    import spark.implicits._
    // group a: {10,11,12,13,14, 100}: n=6, median rank (7)//2=3 -> 12;
    // devs {2,1,0,1,2,88} -> sorted {0,1,1,2,2,88} rank 3 -> MAD 1;
    // outlier iff dev > 3: only the 100 (dev 88)
    val df = Seq(("a", 10.0, 1L), ("a", 11.0, 2L), ("a", 12.0, 3L),
      ("a", 13.0, 4L), ("a", 14.0, 5L), ("a", 100.0, 6L))
      .toDF("g", "v", "id")
    val r = graft.dq.Stats.madOutliers(df, "g", col("v"), col("id"))
      .select(col("id"), col("med"), col("mad"), col("is_outlier"))
      .as[(Long, Double, Double, Int)].collect()
      .map(t => t._1 -> t).toMap
    r.values.foreach { t => t._2 shouldBe 12.0; t._3 shouldBe 1.0 }
    r(6L)._4 shouldBe 1
    (1L to 5L).foreach(i => r(i)._4 shouldBe 0)
    graft.util.Caches.releaseAll(spark)
  }

  it should "flag every deviating row when over half the group is identical (MAD 0)" in {
    import spark.implicits._
    val df = (Seq.fill(5)(7.0) :+ 7.5).zipWithIndex
      .map { case (v, i) => ("g", v, i.toLong) }.toDF("g", "v", "id")
    val flags = graft.dq.Stats.madOutliers(df, "g", col("v"), col("id"))
      .select(col("value"), col("is_outlier"))
      .as[(Double, Int)].collect().toMap
    flags(7.0) shouldBe 0
    flags(7.5) shouldBe 1 // dev 0.5 > 3 * MAD(0)
    graft.util.Caches.releaseAll(spark)
  }

  it should "reject quantile rationals outside (0, 1]" in {
    import spark.implicits._
    val df = Seq(("a", 1.0, 1L)).toDF("grp", "v", "id")
    intercept[IllegalArgumentException] {
      graft.dq.Stats.groupQuantiles(df, "grp", col("v"), col("id"),
        Seq((5, 4, "p125")))
    }
    intercept[IllegalArgumentException] {
      graft.dq.Stats.groupQuantiles(df, "grp", col("v"), col("id"),
        Seq((0, 4, "p0")))
    }
  }

  "keySkewReport (X126)" should "rank hand-computed hot keys and exclude NULLs" in {
    import spark.implicits._
    // key a: 6 rows, b: 3, c: 1 (+2 NULL rows excluded)
    // n_keys=3, n_rows=10, mean=10/3, skew = 6/(10/3) = 1.8
    val df = (Seq.fill(6)(Some("a")) ++ Seq.fill(3)(Some("b")) ++
      Seq(Some("c"), None, None)).toDF("k")
    val r = graft.dq.Stats.keySkewReport(df, col("k"), k = 2)
      .as[(Long, String, Long, Double, Double, Long, Long, Double)]
      .collect().sortBy(_._1)
    r.length shouldBe 2 // top-2 of 3 keys
    r(0) shouldBe ((1L, "a", 6L, 0.6, 1.8, 3L, 10L, 1.8))
    r(1)._2 shouldBe "b"
    r(1)._4 shouldBe 0.3
    // tie-break: equal counts rank by key ascending
    val tied = Seq("x", "x", "y", "y").toDF("k")
    val rt = graft.dq.Stats.keySkewReport(tied, col("k"), k = 2)
      .as[(Long, String, Long, Double, Double, Long, Long, Double)]
      .collect().sortBy(_._1)
    rt.map(_._2).toSeq shouldBe Seq("x", "y")
    rt.foreach(_._8 shouldBe 1.0) // perfectly even: skew factor 1
    graft.util.Caches.releaseAll(spark)
  }

  "conformalInterval (F29)" should "pick the hand-computed rank residual and fail loud when starved" in {
    import spark.implicits._
    // calibration residuals |y - pred|: pred = 0 so residual = |y|
    // values 1..9 -> n=9; alpha=1/10 -> rank = ceil(0.9*10) = 9 -> q=9
    val cal = (1 to 9).map(i => (i.toLong, 0.0, i.toDouble))
      .toDF("id", "pred", "y")
    val sc = Seq((100L, 50.0)).toDF("id", "pred")
    val r = graft.ml.Eval.conformalInterval(cal, col("pred"), col("y"),
        sc, col("pred"), col("id"), 1, 10)
      .as[(Long, Double, Double, Double, Double)].head()
    r shouldBe ((100L, 50.0, 9.0, 41.0, 59.0))
    // alpha=1/2 -> rank = ceil(0.5*10) = 5 -> q=5
    val r2 = graft.ml.Eval.conformalInterval(cal, col("pred"), col("y"),
        sc, col("pred"), col("id"), 1, 2)
      .as[(Long, Double, Double, Double, Double)].head()
    r2._3 shouldBe 5.0
    // n=3 at alpha=1/10: rank ceil(0.9*4)=4 > 3 -> q-hat infinite
    intercept[IllegalArgumentException] {
      graft.ml.Eval.conformalInterval(cal.limit(3), col("pred"),
        col("y"), sc, col("pred"), col("id"), 1, 10)
    }
    graft.util.Caches.releaseAll(spark)
  }

  "prCurve (F30)" should "match a hand-computed curve with ties and the step AP" in {
    import spark.implicits._
    // scores desc: 0.9 (pos), 0.8 (neg, pos tie group), 0.7 (neg)
    // rows: (0.9,1), (0.8,1), (0.8,0), (0.7,0)
    // s=0.9: tp=1 cum=1 -> prec 1, rec 1/2
    // s=0.8: tp=2 cum=3 -> prec 2/3, rec 1
    // s=0.7: tp=2 cum=4 -> prec 1/2, rec 1
    // AP = 1/2*1 + 1/2*(2/3) + 0*(1/2) = 5/6
    val df = Seq((0.9, 1), (0.8, 1), (0.8, 0), (0.7, 0))
      .toDF("s", "y")
    val r = graft.ml.Eval.prCurve(df, col("s"), col("y"))
      .as[(Double, Long, Long, Long, Long, Double, Double, Double)]
      .collect().sortBy(-_._1)
    r.map(_._1).toSeq shouldBe Seq(0.9, 0.8, 0.7)
    r(0)._6 shouldBe 1.0
    r(0)._7 shouldBe 0.5
    r(1)._4 shouldBe 2L // tp
    r(1)._5 shouldBe 1L // fp
    r(1)._6 shouldBe 2.0 / 3 +- 1e-15
    r(1)._7 shouldBe 1.0
    r(2)._6 shouldBe 0.5
    r.foreach(_._8 shouldBe 5.0 / 6 +- 1e-15)
    // no positives anywhere: fail loud, not NaN curves
    intercept[IllegalArgumentException] {
      graft.ml.Eval.prCurve(df.withColumn("y", lit(0)), col("s"),
        col("y"))
    }
    graft.util.Caches.releaseAll(spark)
  }

  "maxF1Point / precisionFloorPoint (F31)" should "pick hand-computed operating points" in {
    import spark.implicits._
    // curve (from the F30 spec): s=0.9 P=1 R=1/2 F1=2/3;
    // s=0.8 P=2/3 R=1 F1=4/5; s=0.7 P=1/2 R=1 F1=2/3
    val df = Seq((0.9, 1), (0.8, 1), (0.8, 0), (0.7, 0))
      .toDF("s", "y")
    val m = graft.ml.Eval.maxF1Point(df, col("s"), col("y"))
      .as[(Double, Long, Long, Double, Double, Double)].head()
    m._1 shouldBe 0.8
    m._6 shouldBe 0.8 +- 1e-15
    // precision floor 1/1 (100%): only s=0.9 qualifies
    val p = graft.ml.Eval.precisionFloorPoint(df, col("s"), col("y"),
        1, 1)
      .as[(Double, Long, Long, Double, Double, Double)].head()
    p._1 shouldBe 0.9
    // floor 3/5 (60%): s=0.8 (P=2/3) qualifies and is the LOWEST such
    // threshold (max recall)
    graft.ml.Eval.precisionFloorPoint(df, col("s"), col("y"), 3, 5)
      .as[(Double, Long, Long, Double, Double, Double)]
      .head()._1 shouldBe 0.8
    // unreachable floor fails loud
    intercept[IllegalArgumentException] {
      graft.ml.Eval.precisionFloorPoint(
        Seq((0.9, 0), (0.8, 1)).toDF("s", "y"), col("s"), col("y"), 1, 1)
    }
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "ml.Scoring.linearContributions"

  it should "attribute exactly w_i * (x_i - mean) and sum to score - baseline" in {
    // x1 in {1,3} mean 2; x2 in {10,30} mean 20; w = (2, 0.1), bias 5
    val df = Seq((1L, 1.0, 10.0), (2L, 3.0, 30.0)).toDF("id", "x1", "x2")
    val r = graft.ml.Scoring.linearContributions(df,
      Seq("x1" -> 2.0, "x2" -> 0.1), bias = 5.0)
      .orderBy(col("id"))
      .select("score", "baseline", "contrib_x1", "contrib_x2")
      .as[(Double, Double, Double, Double)].collect()
    r(0) shouldBe ((8.0, 11.0, -2.0, -1.0)) // 2*1+0.1*10+5, 2*2+0.1*20+5
    r(1) shouldBe ((14.0, 11.0, 2.0, 1.0))
    // additivity: contribs sum to score - baseline (exact here)
    r.foreach { case (s, b, c1, c2) => (c1 + c2) shouldBe (s - b) +- 1e-9 }
  }

  behavior of "ml.FeaturePrep.woeTable"

  it should "compute adjusted WOE and IV for a hand contingency" in {
    // value a: 3 good / 1 bad; value b: 1 good / 3 bad; G = B = 4
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("a", 0),
      ("b", 1), ("b", 0), ("b", 0), ("b", 0)).toDF("v", "y")
    val r = graft.ml.FeaturePrep.woeTable(df, col("v"), col("y"))
      .orderBy(col("value"))
      .select("value", "n", "n_good", "n_bad", "woe", "iv_term", "iv_total")
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
    val woeA = math.log((3.5 / 4.0) / (1.5 / 4.0)) // ln(7/3)
    r(0)._5 shouldBe math.floor(woeA * 1e6 + 0.5) / 1e6
    val ivA = (3.0 / 4 - 1.0 / 4) * woeA
    r(0)._6 shouldBe math.floor(ivA * 1e6 + 0.5) / 1e6
    // symmetric contingency: iv_b = iv_a, total = 2 * term
    r(0)._7 shouldBe (r(0)._6 + r(1)._6) +- 1e-12
    r(1)._5 shouldBe -r(0)._5 +- 1e-12
  }

  it should "fail loud on NULL labels" in {
    val df = Seq(("a", Some(1)), ("a", None)).toDF("v", "y")
    an[Exception] should be thrownBy {
      graft.ml.FeaturePrep.woeTable(df, col("v"), col("y")).collect()
    }
  }

  behavior of "dq.Stats.cuped"

  it should "remove covariate-explained variance and keep the planted lift" in {
    // y = 2x + effect·variant + tiny noise pattern: theta -> ~2,
    // CUPED lift stays ~the planted 5, variance reduction is large
    val rows = (1 to 40).map { i =>
      val x = ((i + 1) / 2 % 10).toDouble // same x in both arms —
      val v = i % 2                       // covariate ⫫ treatment
      (v, x, 2.0 * x + 5.0 * v + (if (i % 4 == 0) 0.5 else 0.0))
    }
    val df = rows.toDF("v", "x", "y")
    val r = graft.dq.Stats.cuped(df, col("v"), col("x"), col("y"))
      .select("theta", "lift_raw", "lift_cuped", "variance_reduction")
      .as[(Double, Double, Double, Double)].head()
    r._1 shouldBe 2.0 +- 0.1
    r._3 shouldBe 5.0 +- 0.3
    r._4 should be > 0.8 // x explains most variance (the treatment
    // effect itself contributes ~6/39 that CUPED must NOT remove)
    // balanced arms: raw lift close to the planted effect too
    r._2 shouldBe 5.0 +- 0.3
  }

  it should "NULL the adjustment when the covariate is constant" in {
    val df = Seq((0, 1.0, 2.0), (0, 1.0, 3.0), (1, 1.0, 9.0),
      (1, 1.0, 8.0)).toDF("v", "x", "y")
    val r = graft.dq.Stats.cuped(df, col("v"), col("x"), col("y"))
      .select("theta", "lift_raw", "lift_cuped")
      .as[(Option[Double], Option[Double], Option[Double])].head()
    r._1 shouldBe None
    r._2.get shouldBe 6.0 // raw lift still reports
    r._3 shouldBe None
  }

  behavior of "ml.FeaturePrep.standardScaler"

  it should "fit hand moments and transform with the published quantized params" in {
    val df = Seq((1L, 2.0, 7.0), (2L, 4.0, 7.0), (3L, 6.0, 7.0))
      .toDF("id", "a", "b")
    val params = graft.ml.FeaturePrep.standardScalerFit(df, Seq("a", "b"))
      .orderBy(col("feature"))
      .as[(String, Long, Option[Double], Option[Double])].collect()
    params(0) shouldBe (("a", 3L, Some(4.0), Some(2.0)))
    params(0)._4.get shouldBe 2.0 // sample std of {2,4,6}
    params(1)._1 shouldBe "b"
    params(1)._4.get shouldBe 0.0 // constant feature
    val out = graft.ml.FeaturePrep.standardScalerTransform(df,
      graft.ml.FeaturePrep.standardScalerFit(df, Seq("a", "b")))
      .orderBy(col("id"))
      .select("a_scaled", "b_scaled")
      .as[(Option[Double], Option[Double])].collect()
    out.map(_._1.get) shouldBe Array(-1.0, 0.0, 1.0)
    out.foreach(_._2 shouldBe None) // zero-variance -> NULL, not 0
  }

  behavior of "ml.Eval.rollingOriginFolds"

  it should "tile the hand date grid and fail loud on a short span" in {
    import org.apache.spark.sql.functions.to_timestamp
    // 10 days, 2 folds x 3-day horizons -> initial train = 4 days;
    // fold 1 trains d1-4 tests d5-7; fold 2 trains d1-7 tests d8-10
    val df = (1 to 10).map(i =>
      (i.toLong, s"2024-01-${"%02d".format(i)} 12:00:00"))
      .toDF("id", "ts").withColumn("ts", to_timestamp(col("ts")))
    val r = graft.ml.Eval.rollingOriginFolds(df, col("id"), col("ts"),
      folds = 2, horizonDays = 3)
      .groupBy("fold", "role").count()
      .as[(Int, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    r shouldBe Map((1, "train") -> 4L, (1, "test") -> 3L,
      (2, "train") -> 7L, (2, "test") -> 3L)
    an[Exception] should be thrownBy {
      graft.ml.Eval.rollingOriginFolds(df, col("id"), col("ts"),
        folds = 4, horizonDays = 3).collect() // needs 12 + initial > 10
    }
  }

  behavior of "ml.FeaturePrep.hashFeatures"

  it should "hash deterministically, keep NULLs as signal, and pre-combine collisions" in {
    val df = Seq((1L, Some("a"), "x"), (2L, Some("a"), "x"),
      (3L, None, "x")).toDF("id", "c1", "c2")
    val r = graft.ml.FeaturePrep.hashFeatures(df, "id",
      Seq("c1", "c2"), dims = 16)
      .as[(Long, Long, Long)].collect()
    val byId = r.groupBy(_._1).view.mapValues(
      _.map(t => (t._2, t._3)).toSet).toMap
    byId(1L) shouldBe byId(2L)          // identical rows hash identically
    byId(3L) should not be byId(1L)     // NULL c1 is its own feature
    // every bucket is in range and weights are ±1 or a combined sum
    r.foreach { case (_, b, w) =>
      b should (be >= 0L and be < 16L)
      math.abs(w) should (be >= 1L and be <= 2L)
    }
    // each row emits at most 2 buckets (2 features, maybe colliding)
    byId.values.foreach(_.size should be <= 2)
    // the same value under DIFFERENT feature names hashes differently
    // (the name is part of the hash input): c1='x' vs c2='x'
    val single = graft.ml.FeaturePrep.hashFeatures(
      Seq((9L, "x", "x")).toDF("id", "c1", "c2"), "id",
      Seq("c1", "c2"), dims = 1024)
      .as[(Long, Long, Long)].collect()
    single.length shouldBe 2 // no collision at dims=1024 for these two
  }

  behavior of "ml.Stats.mutualInformation"

  it should "report nmi = 1 for a bijection and ~0 for independence" in {
    // bijection: x determines y exactly
    val bij = Seq(("a", "u"), ("b", "v"), ("a", "u"), ("b", "v"))
      .toDF("x", "y")
    val r1 = graft.ml.Stats.mutualInformation(bij, col("x"), col("y"))
      .select("nmi").as[Option[Double]].collect()
    r1.foreach(_.get shouldBe 1.0 +- 1e-5)
    // independent uniform 2x2: every cell count equal -> MI = 0
    val ind = (for { x <- Seq("a", "b"); y <- Seq("u", "v") } yield (x, y))
      .toDF("x", "y")
    val r2 = graft.ml.Stats.mutualInformation(ind, col("x"), col("y"))
      .select("mi_total").as[Double].collect()
    r2.foreach(_ shouldBe 0.0 +- 1e-5)
  }

  behavior of "dq.Stats.ucbSnapshot"

  it should "rank arms by the hand-computed UCB1 index" in {
    // arm a: 8 pulls 6 wins (0.75); arm b: 2 pulls 1 win (0.5); N = 10
    // ucb_a = 0.75 + sqrt(2 ln 10 / 8); ucb_b = 0.5 + sqrt(2 ln 10 / 2)
    // -> b's exploration bonus wins despite the lower mean
    val df = (Seq.fill(6)(("a", 1)) ++ Seq.fill(2)(("a", 0)) ++
      Seq(("b", 1), ("b", 0))).toDF("arm", "r")
    val r = graft.dq.Stats.ucbSnapshot(df, col("arm"), col("r"))
      .orderBy(col("arm"))
      .select("arm", "n", "mean_reward", "ucb", "is_chosen")
      .as[(String, Long, Double, Double, Int)].collect()
    r(0)._3 shouldBe 0.75
    r(1)._3 shouldBe 0.5
    r(0)._4 shouldBe math.floor(
      (0.75 + math.sqrt(2 * math.log(10.0) / 8)) * 1e6 + 0.5) / 1e6
    r(1)._4 shouldBe math.floor(
      (0.5 + math.sqrt(2 * math.log(10.0) / 2)) * 1e6 + 0.5) / 1e6
    r.map(t => t._1 -> t._5).toMap shouldBe Map("a" -> 0, "b" -> 1)
  }

  behavior of "dq.Stats.diffInDiff"

  it should "recover a planted treatment effect exactly" in {
    // control: 10 -> 12 (+2 trend); treated: 20 -> 27 (+2 trend +5
    // effect); two rows per cell with ±1 spread so variances exist
    def cell(g: Int, p: Int, m: Double) =
      Seq((g, p, m - 1.0), (g, p, m + 1.0))
    val df = (cell(0, 0, 10) ++ cell(0, 1, 12) ++ cell(1, 0, 20) ++
      cell(1, 1, 27)).toDF("g", "p", "y")
    val r = graft.dq.Stats.diffInDiff(df, col("g"), col("p"), col("y"))
      .select("did", "se", "z")
      .as[(Double, Double, Double)].head()
    r._1 shouldBe 5.0
    // each cell: n=2, var=2 -> se = sqrt(4 * 2/2) = 2
    r._2 shouldBe 2.0
    r._3 shouldBe 2.5
  }

  behavior of "dq.Stats.welchT"

  it should "match the hand-computed Welch t and Satterthwaite dof" in {
    // arm0 = [1,2,3]: mean 2, var 1; arm1 = [2,4,6,8]: mean 5, var 20/3
    // se2 = (20/3)/4 + 1/3 = 2 -> t = 3/sqrt(2); dof = 4.075472
    val df = (Seq(1.0, 2.0, 3.0).map((0, _)) ++
      Seq(2.0, 4.0, 6.0, 8.0).map((1, _))).toDF("v", "x")
    val r = graft.dq.Stats.welchT(df, col("v"), col("x"))
      .select("n0", "n1", "mean0", "mean1", "var0", "var1", "t", "dof")
      .as[(Long, Long, Double, Double, Double, Double, Double, Double)]
      .head()
    r._1 shouldBe 3L; r._2 shouldBe 4L
    r._3 shouldBe 2.0; r._4 shouldBe 5.0
    // variances publish at 2 decimals (quantize's 2^53 contract at
    // metric² magnitude — see welchFromMoments)
    r._5 shouldBe 1.0; r._6 shouldBe math.floor(20.0 / 3 * 1e2 + 0.5) / 1e2
    r._7 shouldBe math.floor(3.0 / math.sqrt(2.0) * 1e6 + 0.5) / 1e6
    val se2 = 20.0 / 3 / 4 + 1.0 / 3
    val dof = se2 * se2 / (math.pow(20.0 / 3 / 4, 2) / 3 +
      math.pow(1.0 / 3, 2) / 2)
    r._8 shouldBe math.floor(dof * 1e6 + 0.5) / 1e6 +- 1e-6
  }

  it should "emit NULL t on degenerate arms" in {
    val df = Seq((0, 1.0), (1, 2.0), (1, 3.0)).toDF("v", "x")
    graft.dq.Stats.welchT(df, col("v"), col("x"))
      .select("t").as[Option[Double]].head() shouldBe None // n0 = 1
  }

  behavior of "ml.Stats.cramersV"

  it should "score a bijection 1, independence 0, and a constant NULL" in {
    import org.apache.spark.sql.DataFrame
    def v(df: DataFrame): (Long, Long, Option[Double]) =
      graft.ml.Stats.cramersV(df, col("x"), col("y"))
        .select("dof", "n", "cramers_v")
        .as[(Long, Long, Option[Double])].head()
    val bij = Seq(("a", "u"), ("b", "v"), ("a", "u"), ("b", "v"))
      .toDF("x", "y")
    val (dof1, _, v1) = v(bij)
    dof1 shouldBe 1L
    v1.get shouldBe 1.0 +- 1e-6
    val ind = (for { x <- Seq("a", "b"); y <- Seq("u", "v") }
      yield (x, y)).toDF("x", "y")
    v(ind)._3.get shouldBe 0.0 +- 1e-6
    val const = Seq(("a", "u"), ("a", "v")).toDF("x", "y")
    v(const)._3 shouldBe None // min(R,C) = 1: no association to measure
  }

  behavior of "dq.Stats.bhFdr"

  it should "reject only the strong arm and exclude degenerate groups from m" in {
    def arm(g: String, v: Int, n: Int, c: Int) =
      Seq.fill(c)((g, v, 1)) ++ Seq.fill(n - c)((g, v, 0))
    val rows =
      arm("A", 0, 1000, 100) ++ arm("A", 1, 1000, 200) ++ // z ~ 6.1
        arm("B", 0, 1000, 100) ++ arm("B", 1, 1000, 110) ++ // null-ish
        arm("C", 0, 1000, 100) ++ arm("C", 1, 1000, 100) ++ // exactly null
        arm("D", 0, 50, 50) ++ arm("D", 1, 50, 50) // degenerate: pp = 1
    val df = rows.toDF("g", "v", "y")
    val r = graft.dq.Stats.bhFdr(df, Seq("g"), col("v"), col("y"))
      .orderBy(col("rank"))
      .select("g", "p", "rank", "m", "significant")
      .as[(String, Double, Long, Long, Int)].collect()
    r.map(_._1) shouldBe Array("A", "B", "C") // D excluded entirely
    r.foreach(_._4 shouldBe 3L)               // m counts only testable groups
    r(0)._2 should be < 1e-8                  // the planted effect
    r(0)._5 shouldBe 1
    r(1)._5 shouldBe 0
    r(2)._5 shouldBe 0
    // z = 0 exactly for C -> two-sided p = 2(1 - Phi(0)) ~ 1 under A&S
    r(2)._2 shouldBe 1.0 +- 1e-7
  }

  it should "step up: a borderline p is rescued by a stronger one below it" in {
    // m = 2, q = 1/2 (50% FDR to make the hand arithmetic visible):
    // BH accepts rank 2 iff p(2) <= 2/2 * q = 0.5
    def arm(g: String, v: Int, n: Int, c: Int) =
      Seq.fill(c)((g, v, 1)) ++ Seq.fill(n - c)((g, v, 0))
    val rows = arm("A", 0, 1000, 100) ++ arm("A", 1, 1000, 200) ++
      arm("B", 0, 1000, 100) ++ arm("B", 1, 1000, 115) // p ~ 0.30
    val r = graft.dq.Stats.bhFdr(rows.toDF("g", "v", "y"), Seq("g"),
      col("v"), col("y"), qNum = 1, qDen = 2)
      .orderBy(col("rank")).select("g", "p", "significant")
      .as[(String, Double, Int)].collect()
    r(1)._2 should (be > 0.05 and be < 0.5) // genuinely borderline
    r(1)._3 shouldBe 1 // rescued by the step-up at rank 2
  }

  behavior of "ml.Eval.isotonicCalibration"

  it should "match the sequential PAV fit on a hand case" in {
    // 4 buckets, 2 rows each, rates [1, 0, 0, 1] -> PAV pools the first
    // three blocks to 1/3 and leaves the last at 1
    val df = Seq((0.0, 1), (0.0, 1), (1.0, 0), (1.0, 0),
      (2.0, 0), (2.0, 0), (3.0, 1), (3.0, 1)).toDF("s", "y")
    val r = graft.ml.Eval.isotonicCalibration(df, col("s"), col("y"),
      nBuckets = 4).orderBy(col("bucket"))
      .select("bucket", "n", "pos", "fitted")
      .as[(Long, Long, Long, Double)].collect()
    r.map(_._1) shouldBe Array(0L, 1L, 2L, 3L)
    r.map(_._4) shouldBe Array(1.0 / 3, 1.0 / 3, 1.0 / 3, 1.0)
  }

  it should "agree with reference PAV on an uneven-weight sequence and stay monotone" in {
    // rates [0.8(5), 0.2(5), 0.6(10), 0.5(2), 0.9(10)] with weights in
    // parens; reference PAV computed by the classic stack algorithm below
    val spec = Seq((0.0, 5, 4), (1.0, 5, 1), (2.0, 10, 6), (3.0, 2, 1),
      (4.0, 10, 9))
    val rows = spec.flatMap { case (s, n, pos) =>
      Seq.fill(pos)((s, 1)) ++ Seq.fill(n - pos)((s, 0))
    }
    val df = rows.toDF("s", "y")
    val got = graft.ml.Eval.isotonicCalibration(df, col("s"), col("y"),
      nBuckets = 5).orderBy(col("bucket"))
      .select("fitted").as[Double].collect()
    // sequential PAV oracle
    val stack = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    spec.foreach { case (_, n, pos) =>
      var blk = (pos.toDouble, n.toDouble)
      while (stack.nonEmpty &&
        stack.last._1 / stack.last._2 >= blk._1 / blk._2) {
        val t = stack.remove(stack.size - 1)
        blk = (blk._1 + t._1, blk._2 + t._2)
      }
      stack += blk
    }
    // expand per-bucket: block sizes are in rows, map back to buckets
    val perBucket = {
      val out = scala.collection.mutable.ArrayBuffer[Double]()
      var bi = 0
      stack.foreach { case (p, n) =>
        var left = n
        while (left > 0 && bi < spec.length) {
          out += p / n; left -= spec(bi)._2; bi += 1
        }
      }
      out.toArray
    }
    got.length shouldBe 5
    got.zip(perBucket).foreach { case (a, b) => a shouldBe b +- 1e-12 }
    got.sliding(2).foreach(w => w(0) should be <= w(1) + 1e-12)
  }

  behavior of "ml.Eval.confusionSuite"

  it should "match a hand-computed confusion scorecard" in {
    // tp=4 fp=1 tn=3 fn=2 (n=10)
    val df = (Seq.fill(4)((1, 1)) ++ Seq.fill(1)((1, 0)) ++
      Seq.fill(3)((0, 0)) ++ Seq.fill(2)((0, 1))).toDF("p", "y")
    val r = graft.ml.Eval.confusionSuite(df, col("p") === 1,
      col("y") === 1)
      .select("tp", "fp", "tn", "fn", "accuracy", "precision", "recall",
        "f1", "mcc", "kappa")
      .as[(Long, Long, Long, Long, Double, Double, Double, Double,
        Double, Double)].head()
    r._1 shouldBe 4L; r._2 shouldBe 1L; r._3 shouldBe 3L; r._4 shouldBe 2L
    r._5 shouldBe 0.7 +- 1e-9
    r._6 shouldBe 0.8 +- 1e-9
    r._7 shouldBe (2.0 / 3.0) +- 1e-6
    r._8 shouldBe (8.0 / 11.0) +- 1e-6
    val mcc = (4.0 * 3 - 1.0 * 2) / math.sqrt(5.0 * 6 * 4 * 5)
    r._9 shouldBe mcc +- 1e-6
    val pe = (5.0 * 6 + 5.0 * 4) / 100.0
    r._10 shouldBe (0.7 - pe) / (1.0 - pe) +- 1e-6
  }

  it should "emit NULLs on one-class degenerate inputs, never divide by zero" in {
    val df = Seq((1, 1), (1, 1)).toDF("p", "y") // all positive
    val r = graft.ml.Eval.confusionSuite(df, col("p") === 1,
      col("y") === 1)
      .select("specificity", "mcc", "kappa")
      .as[(Option[Double], Option[Double], Option[Double])].head()
    r shouldBe ((None, None, None))
  }

  it should "fail loud on NULL predictions or labels" in {
    val df = Seq((Some(1), 1), (None, 0)).toDF("p", "y")
    an[Exception] should be thrownBy {
      graft.ml.Eval.confusionSuite(df, col("p") === 1, col("y") === 1)
        .collect()
    }
  }

  it should "emit NULL nmi when a variable is constant" in {
    val df = Seq(("a", "u"), ("a", "v")).toDF("x", "y")
    val r = graft.ml.Stats.mutualInformation(df, col("x"), col("y"))
      .select("nmi").as[Option[Double]].collect()
    r.foreach(_ shouldBe None)
  }

  behavior of "dq.Stats multiple-testing family (F38/F84/F85)"

  it should "order the three procedures: BY rejects within BH, Holm within BH, on shared p-values" in {
    // 6 tests: two strong effects, two mild, two null — all built as
    // exact count cells so the three procedures see IDENTICAL p's
    val counts = Seq(
      ("g1", 1000L, 1000L, 100L, 300L), // strong
      ("g2", 1000L, 1000L, 120L, 260L), // strong-ish
      ("g3", 800L, 800L, 100L, 140L),   // mild
      ("g4", 800L, 800L, 100L, 130L),   // milder
      ("g5", 900L, 900L, 110L, 112L),   // null
      ("g6", 900L, 900L, 115L, 113L))   // null
      .toDF("g", "n0", "n1", "c0", "c1")
    def sig(df: org.apache.spark.sql.DataFrame): Set[String] = df
      .filter(col("significant") === 1).select("g")
      .as[String].collect().toSet
    val bh = sig(graft.dq.Stats.bhFdrFromCounts(counts, Seq("g")))
    val holm = sig(graft.dq.Stats.holmFromCounts(counts, Seq("g")))
    val by = sig(graft.dq.Stats.byFdrFromCounts(counts, Seq("g")))
    // the strong effect survives everything; the nulls survive nothing
    Seq(bh, holm, by).foreach { s =>
      s should contain("g1")
      s should not contain "g5"
      s should not contain "g6"
    }
    // classical containments: Holm (FWER) and BY (dependence-robust
    // FDR) are each no more liberal than BH at the same level
    holm.subsetOf(bh) shouldBe true
    by.subsetOf(bh) shouldBe true
  }

  it should "step down exactly: Holm's cutoff is the first failing rank minus one" in {
    // one huge effect, then junk: rank 1 passes p <= alpha/m, rank 2
    // fails p <= alpha/(m-1) -> holm_cutoff_rank = 1
    val counts = Seq(
      ("a", 2000L, 2000L, 100L, 600L),
      ("b", 50L, 50L, 20L, 26L),
      ("c", 50L, 50L, 22L, 25L),
      ("d", 50L, 50L, 23L, 24L))
      .toDF("g", "n0", "n1", "c0", "c1")
    val r = graft.dq.Stats.holmFromCounts(counts, Seq("g"))
      .orderBy(col("rank"))
      .select("g", "rank", "holm_cutoff_rank", "significant")
      .as[(String, Long, Long, Int)].collect()
    r.head._1 shouldBe "a"
    r.head._4 shouldBe 1
    val cutoff = r.head._3
    r.foreach { case (_, rank, c, s) =>
      c shouldBe cutoff
      s shouldBe (if (rank <= cutoff) 1 else 0)
    }
    // BY's harmonic factor only shrinks the BH cutoff
    val bhC = graft.dq.Stats.bhFdrFromCounts(counts, Seq("g"))
      .select(max(col("bh_cutoff_rank"))).as[Long].collect().head
    val byC = graft.dq.Stats.byFdrFromCounts(counts, Seq("g"))
      .select(max(col("by_cutoff_rank"))).as[Long].collect().head
    byC should be <= bhC
  }

  behavior of "dq.Stats.cochranArmitage (F86)"

  it should "reproduce the hand A/B integers and z on a planted dose response" in {
    // doses 0/1/2, n = (10,10,10), c = (1,5,9): Swc = 23, Swn = 30,
    // Sw2n = 50; A = 30*23 - 15*30 = 240, B = 30*50 - 900 = 600;
    // z = 240/sqrt(15*15*600/30) = 3.577709 (q6)
    val rows = (Seq.fill(1)(0L -> 1L) ++ Seq.fill(9)(0L -> 0L) ++
      Seq.fill(5)(1L -> 1L) ++ Seq.fill(5)(1L -> 0L) ++
      Seq.fill(9)(2L -> 1L) ++ Seq.fill(1)(2L -> 0L))
      .toDF("g", "y")
    val r = graft.dq.Stats.cochranArmitage(rows, col("g"), col("y"),
      Seq(0L, 1L, 2L))
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().head
    r._1 shouldBe 30L
    r._2 shouldBe 15L
    r._3 shouldBe 3L
    val zHand = 240.0 / math.sqrt(15.0 * 15.0 * 600.0 / 30.0)
    r._4.get shouldBe math.floor(zHand * 1e6 + 0.5) / 1e6
    r._5.get should be < 0.001
    // the reversed ramp flips the sign
    val rev = rows.select((lit(2L) - col("g")).as("g"), col("y"))
    graft.dq.Stats.cochranArmitage(rev, col("g"), col("y"),
      Seq(0L, 1L, 2L))
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().head._4.get shouldBe
      -(math.floor(zHand * 1e6 + 0.5) / 1e6)
    graft.util.Caches.releaseAll(spark)
  }

  it should "guard doses and degenerate boards, and stay partition-invariant" in {
    val rows = (1 to 120).map(i => ((i % 3).toLong,
      if (i % 5 == 0) 1L else 0L)).toDF("g", "y")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.dq.Stats.cochranArmitage(df, col("g"), col("y"),
        Seq(0L, 1L, 2L))
        .as[(Long, Long, Long, Option[Double], Option[Double])]
        .collect().head
    run(rows.coalesce(1)) shouldBe run(rows.repartition(13))
    // flat rate per level -> z ~ 0 (exactly 0 here: equal counts)
    run(rows)._4.get shouldBe 0.0 +- 1e-9
    // all-converted board is degenerate -> NULL z/p
    val allc = rows.select(col("g"), lit(1L).as("y"))
    run(allc)._4 shouldBe None
    // undeclared level and non-binary outcome fail loud
    an[Exception] should be thrownBy
      graft.dq.Stats.cochranArmitage(
        Seq((7L, 1L)).toDF("g", "y"), col("g"), col("y"),
        Seq(0L, 1L, 2L)).collect()
    an[Exception] should be thrownBy
      graft.dq.Stats.cochranArmitage(
        Seq((1L, 3L)).toDF("g", "y"), col("g"), col("y"),
        Seq(0L, 1L, 2L)).collect()
    // a FRACTIONAL outcome must not truncate into the 0/1 gate:
    // 0.9.cast(long) is 0 and would silently pass as a non-conversion
    an[Exception] should be thrownBy
      graft.dq.Stats.cochranArmitage(
        Seq((1L, 0.9)).toDF("g", "y"), col("g"), col("y"),
        Seq(0L, 1L, 2L)).collect()
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "dq.Stats.brownForsythe (D28)"

  it should "match the hand median-centered W and return 0 for equal spreads" in {
    // a=[1..5] (med 3), b=[10,30,50,70,90] (med 50): z-means 1.2 vs 24,
    // W = (N-k)/(k-1) * num/den = 9.259708 (q6)
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 5.0).map(("a", _)) ++
      Seq(10.0, 30.0, 50.0, 70.0, 90.0).map(("b", _))).toDF("g", "v")
    val r = graft.dq.Stats.brownForsythe(df, col("g"), col("v"))
      .as[(Long, Long, Double, Double, Option[Double])].collect().head
    r._1 shouldBe 10L
    r._2 shouldBe 2L
    r._5.get shouldBe 9.259708 +- 1e-9
    // identical |x - med| profiles -> zero between-group spread signal
    val eq = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(11.0, 12.0, 13.0).map(("b", _))).toDF("g", "v")
    graft.dq.Stats.brownForsythe(eq, col("g"), col("v"))
      .as[(Long, Long, Double, Double, Option[Double])].collect()
      .head._5.get shouldBe 0.0 +- 1e-12
  }

  it should "use the LOWER median on even groups and stay partition-invariant" in {
    // even n: [1,2,3,4] -> lower median 2 (not 2.5): z = [1,0,1,2]
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map(("a", _)) ++
      Seq(5.0, 6.0, 7.0, 8.0).map(("b", _))).toDF("g", "v")
    val r = graft.dq.Stats.brownForsythe(df, col("g"), col("v"))
      .as[(Long, Long, Double, Double, Option[Double])].collect().head
    // both groups share z-profile [1,0,1,2] -> ssb = 0 -> W = 0
    r._5.get shouldBe 0.0 +- 1e-12
    val big = (1 to 400).map(i =>
      (s"g${i % 3}", (i * 37 % 101).toDouble)).toDF("g", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.dq.Stats.brownForsythe(d, col("g"), col("v"))
        .as[(Long, Long, Double, Double, Option[Double])].collect().head
    run(big.coalesce(1)) shouldBe run(big.repartition(19))
  }

  it should "fail loud when a deviation leaves the DECIMAL(18,6) grid" in {
    // |x - median| = 2e12 overflows the (18,6) re-cast inside
    // oneWayAnova; pre-guard this NULLed silently (n_g counted the row,
    // the moment sums skipped it) while DuckDB errors — now raise_error
    val df = Seq(("a", 0.0), ("a", 2.0e12), ("b", 1.0), ("b", 2.0))
      .toDF("g", "v")
    // ANSI-on sessions fail at the cast itself; non-ANSI sessions hit
    // the raise_error guard — both loud, both name the decimal grid
    val e = intercept[Exception] {
      graft.dq.Stats.brownForsythe(df, col("g"), col("v")).collect()
    }
    e.getMessage.toLowerCase.replace(" ", "") should
      include("decimal(18,6)")
  }
}
