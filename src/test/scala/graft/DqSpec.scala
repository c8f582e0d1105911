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

  it should "run a TopNotch JSON plan end-to-end (view -> assertion -> diff)" in {
    import graft.dq.DqPlans
    val base = java.nio.file.Files.createTempDirectory("dqplan").toString
    Seq((1, 10.0, "a"), (2, -5.0, "b"), (3, 20.0, "a"), (4, -1.0, "b"))
      .toDF("id", "amount", "tag")
      .write.mode("overwrite").parquet(s"$base/sales.parquet")
    Seq((1, 10.0), (2, -6.0), (3, 20.0), (4, -1.0))
      .toDF("idOld", "amountOld")
      .write.mode("overwrite").parquet(s"$base/old.parquet")
    val plan =
      """{"topnotch": [
        |  {"command": "view", "externalParamsFile": "view.json",
        |   "inputs": [{"ref": "sales.parquet", "onDisk": true}],
        |   "outputKey": "salesView", "cache": true},
        |  {"command": "assertion", "externalParamsFile": "asserts.json",
        |   "input": {"ref": "salesView", "onDisk": false},
        |   "outputKey": "salesReport",
        |   "outputPath": "report.parquet"},
        |  {"command": "diff", "externalParamsFile": "diff.json",
        |   "input1": {"ref": "sales.parquet", "onDisk": true},
        |   "input2": {"ref": "old.parquet", "onDisk": true},
        |   "outputKey": "salesDiff"}
        |]}""".stripMargin
    val params = Map(
      "view.json" ->
        """{"topnotch": {"tableAliases": ["sales"],
          |  "query": "SELECT id, amount FROM sales WHERE tag IS NOT NULL"}}""".stripMargin,
      "asserts.json" ->
        """{"topnotch": {"assertions": [
          |  {"query": "amount > 0", "description": "amounts positive", "threshold": 0.5},
          |  {"query": "id < 4", "description": "ids small", "threshold": 0.1}]}}""".stripMargin,
      "diff.json" ->
        """{"topnotch": {
          |  "input1Columns": {"joinColumns": ["id"], "diffColumns": ["amount"]},
          |  "input2Columns": {"joinColumns": ["idOld"], "diffColumns": ["amountOld"]}}}""".stripMargin)
    val out = DqPlans.run(spark, plan, params, inputBase = base,
      outputBase = Some(base))
    // report: one row per assertion, reference column shape
    val report = out("salesReport")
      .select("query", "threshold", "total", "invalid", "passed")
      .as[(String, Double, Long, Long, Boolean)].collect()
      .sortBy(_._1)
    report shouldBe Array(
      ("amount > 0", 0.5, 4L, 2L, true),
      ("id < 4", 0.1, 4L, 1L, false))
    // per-assertion invalid rows stay addressable
    out("salesReport__a1_invalid").select("id").as[Int].collect()
      .sorted shouldBe Array(2, 4)
    // diff maps the old side positionally onto the new side's names
    out("salesDiff").select("id", "amount", "amount_right")
      .as[(Int, Double, Double)].collect() shouldBe Array((2, -5.0, -6.0))
    // outputPath wrote the report
    spark.read.parquet(s"$base/report.parquet").count() shouldBe 2L
  }

  behavior of "profile (D8)"

  it should "profile mixed columns in one pass with exact stats" in {
    val df = Seq(
      (Some(1.0), Some("a"), 1L), (Some(3.0), Some("b"), 2L),
      (None, None, 3L), (Some(2.0), Some("a"), 4L))
      .toDF("x", "s", "k")
    val got = Dq.profile(df, Seq("x", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val x = got("x")
    x.getString(1) shouldBe "numeric"
    x.getLong(2) shouldBe 4L // n_rows
    x.getLong(3) shouldBe 1L // n_nulls
    x.getLong(4) shouldBe 3L // n_distinct
    x.getDouble(5) shouldBe 1.0
    x.getDouble(6) shouldBe 3.0
    x.getDouble(7) shouldBe 2.0 // exact decimal mean of {1,2,3}
    val s = got("s")
    s.getString(1) shouldBe "string"
    s.getString(8) shouldBe "a"
    s.getString(9) shouldBe "b"
    s.isNullAt(5) shouldBe true // no numeric stats for strings
  }

  it should "leave stats NULL for all-null and non-profilable columns" in {
    val df = Seq((Option.empty[Double], java.sql.Timestamp.valueOf(
      "2024-01-01 00:00:00"))).toDF("x", "ts")
    val got = Dq.profile(df, Seq("x", "ts"))
      .collect().map(r => r.getString(0) -> r).toMap
    got("x").getLong(3) shouldBe 1L
    got("x").isNullAt(7) shouldBe true // no mean of nothing
    got("ts").getString(1) shouldBe "other"
    got("ts").getLong(4) shouldBe 1L
    got("ts").isNullAt(5) shouldBe true
  }

  behavior of "chiSquareDrift (D6)"

  it should "match the hand-computed smoothed statistic" in {
    val ref = (Seq.fill(8)("a") ++ Seq.fill(2)("b")).toDF("cat")
    val cur = (Seq.fill(5)("a") ++ Seq.fill(5)("b")).toDF("cat")
    val rows = Dq.chiSquareDrift(ref, cur, "cat")
      .select(col("category"), col("expected"), col("contribution"),
        col("dof"), col("chi2"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val ea = 8.5 / 11.0 * 10.0
    val eb = 2.5 / 11.0 * 10.0
    rows("a")._1 shouldBe ea
    rows("b")._1 shouldBe eb
    rows("a")._2 shouldBe ((5 - ea) * (5 - ea) / ea) +- 1e-12
    rows("a")._3 shouldBe 1L
    rows("a")._4 shouldBe
      BigDecimal((5 - ea) * (5 - ea) / ea + (5 - eb) * (5 - eb) / eb)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-6
    graft.util.Caches.releaseAll(spark)
  }

  it should "stay finite on categories the reference never saw" in {
    val ref = Seq.fill(10)("a").toDF("cat")
    val cur = (Seq.fill(5)("a") ++ Seq.fill(5)("z")).toDF("cat")
    val chi2 = Dq.chiSquareDrift(ref, cur, "cat")
      .select(col("chi2")).as[Double].head()
    chi2.isNaN shouldBe false
    chi2.isInfinite shouldBe false
    chi2 should be > 0.0
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "ksDrift (D7)"

  it should "compute exact hand-checked CDF gaps" in {
    def pop2(vs: Double*) = vs.toSeq.toDF("v")
    // identical -> exactly 0
    Dq.ksDrift(pop2(1, 2, 3), pop2(1, 2, 3), "v")
      .select(col("ks_stat")).as[Double].head() shouldBe 0.0
    // ref {1,2,3,4} vs cur {3,4,5,6}: max gap at v in {2,3,4} = 0.5
    Dq.ksDrift(pop2(1, 2, 3, 4), pop2(3, 4, 5, 6), "v")
      .select(col("n_ref"), col("n_cur"), col("ks_stat"))
      .as[(Long, Long, Double)].head() shouldBe ((4L, 4L, 0.5))
    // fully disjoint -> exactly 1
    Dq.ksDrift(pop2(1, 2), pop2(10, 11), "v")
      .select(col("ks_stat")).as[Double].head() shouldBe 1.0
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "jsdDrift (D34)"

  it should "score 0 on identical, ln 2 on disjoint, symmetric in between" in {
    def pop2(vs: Double*) = vs.toSeq.toDF("v")
    Dq.jsdDrift(pop2(1, 2, 2, 3), pop2(1, 2, 2, 3), "v")
      .select(col("n_ref"), col("n_cur"), col("jsd"))
      .as[(Long, Long, Double)].head() shouldBe ((4L, 4L, 0.0))
    // disjoint supports saturate at ln 2 (q6-published)
    Dq.jsdDrift(pop2(1, 2, 2, 3), pop2(4, 5, 5), "v")
      .select(col("jsd")).as[Double].head() shouldBe 0.693147
    // symmetry: JSD(P||Q) = JSD(Q||P) exactly (the term is symmetric)
    val ab = Dq.jsdDrift(pop2(1, 2, 3, 4), pop2(3, 4, 5), "v")
      .select(col("jsd")).as[Double].head()
    val ba = Dq.jsdDrift(pop2(3, 4, 5), pop2(1, 2, 3, 4), "v")
      .select(col("jsd")).as[Double].head()
    ab shouldBe ba
    ab should be > 0.0
    ab should be < 0.693147
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "psiDrift (D5)"

  private def pop(vs: Seq[Double]) =
    vs.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("v", "id")

  it should "score identical populations exactly zero" in {
    val p = pop((1 to 200).map(_.toDouble))
    val r = Dq.psiDrift(p, p, "v", "id", bins = 10)
      .select(col("bin"), col("n_ref"), col("n_cur"), col("psi"))
      .as[(Int, Long, Long, Double)].collect()
    r.length shouldBe 10
    r.foreach { case (_, nr, nc, psi) =>
      nr shouldBe 20L
      nc shouldBe 20L
      psi shouldBe 0.0 // p == q in every bin: each term is exactly 0
    }
    graft.util.Caches.releaseAll(spark)
  }

  it should "alarm on a shifted distribution and stay finite on empty bins" in {
    val ref = pop((1 to 200).map(_.toDouble))
    // current mass entirely above the reference's top decile edge
    val cur = pop((1 to 100).map(i => 1000.0 + i))
    val rows = Dq.psiDrift(ref, cur, "v", "id", bins = 10)
      .select(col("bin"), col("n_cur"), col("psi"))
      .as[(Int, Long, Double)].collect()
    val psi = rows.head._3
    psi should be > 0.25 // the conventional "significant drift" alarm
    psi.isNaN shouldBe false
    psi.isInfinite shouldBe false // clipping kept ln finite
    // all current mass landed in the last bin
    rows.filter(_._1 == 10).map(_._2).head shouldBe 100L
    rows.filter(_._1 < 10).map(_._2).sum shouldBe 0L
    graft.util.Caches.releaseAll(spark)
  }

  "checkSuite (D11)" should "judge every check kind in one pass with NULL-as-violation semantics" in {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some(5.0), "A", "1-URGENT"),
      (Some(2L), Some(50.0), "B", "9-BOGUS"),   // regex + set violations
      (None, None, "A", "2-HIGH"),              // null key + null range
      (Some(2L), Some(500.0), "A", "3-MEDIUM")) // range violation + dup key
      .toDF("k", "x", "s", "p")
    val r = Dq.checkSuite(df, Seq(
      Dq.Complete("k"),
      Dq.Between("x", 0, 100, threshold = 0.5),
      Dq.InSet("s", Seq("A")),
      Dq.MatchesRegex("p", "^[1-5]-"),
      Dq.Satisfies("x > 0", threshold = 0.25),
      Dq.Unique(Seq("k"))))
      .select(col("check_id"), col("n_violations"), col("passed"))
      .as[(Int, Long, Int)].collect().map(t => t._1 -> ((t._2, t._3)))
      .toMap
    r(0) shouldBe ((1L, 0)) // one NULL key, strict -> fail
    r(1) shouldBe ((2L, 1)) // NULL x + 500 out of range, but 0.5 tolerated
    r(2) shouldBe ((1L, 0)) // 'B'
    r(3) shouldBe ((1L, 0)) // '9-BOGUS'
    r(4) shouldBe ((1L, 1)) // NULL x violates, 25% tolerated
    r(5) shouldBe ((1L, 0)) // k=2 twice (NULL groups count as one value)
    graft.util.Caches.releaseAll(spark)
  }

  it should "bin against reference edges with deterministic rank ties" in {
    // many ties: edges land on repeated values; both populations must
    // bin identically and counts must cover everything
    val ref = pop(Seq.fill(50)(1.0) ++ Seq.fill(50)(2.0))
    val cur = pop(Seq.fill(30)(1.0) ++ Seq.fill(70)(2.0))
    val rows = Dq.psiDrift(ref, cur, "v", "id", bins = 4)
      .select(col("n_ref"), col("n_cur"))
      .as[(Long, Long)].collect()
    rows.map(_._1).sum shouldBe 100L
    rows.map(_._2).sum shouldBe 100L
    graft.util.Caches.releaseAll(spark)
  }

  "kAnonymityRisk (D14)" should "count hand-computed at-risk groups and rows per k" in {
    import spark.implicits._
    // quasi-groups of sizes 1, 3, 6 -> n = 10
    val df = (Seq.fill(1)("a") ++ Seq.fill(3)("b") ++ Seq.fill(6)("c"))
      .zipWithIndex.map { case (g, i) => (g, i.toLong) }.toDF("q", "id")
    val r = graft.dq.Dq.kAnonymityRisk(df, Seq("q"), ks = Seq(2, 5, 10))
      .as[(Int, Long, Long, Long, Long, Double)].collect()
      .map(t => t._1 -> t).toMap
    r(2) shouldBe ((2, 10L, 3L, 1L, 1L, 0.1))
    r(5) shouldBe ((5, 10L, 3L, 2L, 4L, 0.4))
    r(10) shouldBe ((10, 10L, 3L, 3L, 10L, 1.0))
    intercept[IllegalArgumentException] {
      graft.dq.Dq.kAnonymityRisk(df, Seq("q"), ks = Seq(1))
    }
    graft.util.Caches.releaseAll(spark)
  }

  "tCloseness (D25)" should "hand-compute the ordered EMD and threshold census" in {
    import spark.implicits._
    // global values {1, 2}, each with total 2 (Q cum at v1 = 0.5);
    // group a holds both 1s (P cum at v1 = 1), group b both 2s (P cum
    // at v1 = 0): both gaps are 0.5, m - 1 = 1 => EMD = 0.5 each.
    // One NULL sensitive row is censused, never distributed.
    val df = Seq(("a", Some(1L)), ("a", Some(1L)),
      ("b", Some(2L)), ("b", Some(2L)), ("b", Option.empty[Long]))
      .toDF("q", "s")
    val r = graft.dq.Dq.tCloseness(df, Seq("q"), "s",
        ts = Seq(0.4, 0.6))
      .as[(Double, Long, Long, Long, Long, Long, Long, Double, Double)]
      .collect().map(t => t._1 -> t).toMap
    // (t, n_rows, n_null_rows, n_groups, m_values, n_violating_groups,
    //  n_rows_at_risk, risk_rate, max_emd)
    r(0.4) shouldBe ((0.4, 4L, 1L, 2L, 2L, 2L, 4L, 1.0, 0.5))
    r(0.6) shouldBe ((0.6, 4L, 1L, 2L, 2L, 0L, 0L, 0.0, 0.5))
    // a group matching the global distribution has EMD exactly 0
    val bal = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L))
      .toDF("q", "s")
    graft.dq.Dq.tCloseness(bal, Seq("q"), "s", ts = Seq(0.1))
      .select(col("max_emd")).as[Double].head() shouldBe 0.0
    // constant sensitive value (m = 1): EMD 0 by convention, no 0/0
    val const = Seq(("a", 7L), ("b", 7L)).toDF("q", "s")
    graft.dq.Dq.tCloseness(const, Seq("q"), "s", ts = Seq(0.1))
      .select(col("m_values"), col("max_emd"))
      .as[(Long, Double)].head() shouldBe ((1L, 0.0))
    intercept[IllegalArgumentException] {
      graft.dq.Dq.tCloseness(df, Seq("q"), "s", ts = Seq(1.5))
    }
    graft.util.Caches.releaseAll(spark)
  }

  "referentialIntegrity (D13)" should "count orphans and NULL FKs per relationship" in {
    import spark.implicits._
    val parent = Seq(Tuple1(1L), Tuple1(2L)).toDF("pk")
    val child = Seq(
      (10L, Some(1L)), (11L, Some(2L)), (12L, Some(7L)), // 7: orphan
      (13L, Option.empty[Long]))                         // NULL: not one
      .toDF("id", "fk")
    val r = graft.dq.Dq.referentialIntegrity(Seq(
        ("c->p", child, "fk", parent, "pk")))
      .as[(String, Long, Long, Long, Option[Double])].head()
    r shouldBe (("c->p", 4L, 1L, 1L, Some(0.25)))
    graft.util.Caches.releaseAll(spark)
  }

  "missingPartitions (D16)" should "name exactly the calendar holes inside the observed span" in {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    // observed: 1st, 2nd, 5th, 8th -> holes: 3,4,6,7
    val df = Seq("2024-01-01", "2024-01-02", "2024-01-05", "2024-01-08",
      "2024-01-01") // duplicate day: must not matter
      .map(x => Tuple1(d(x))).toDF("day")
    val r = graft.dq.Dq.missingPartitions(df, col("day"))
      .orderBy(col("missing_day"))
      .as[java.sql.Date].collect().map(_.toString)
    r shouldBe Array("2024-01-03", "2024-01-04", "2024-01-06",
      "2024-01-07")
    // dense span: empty result, not an error
    val dense = Seq("2024-01-01", "2024-01-02").map(x => Tuple1(d(x)))
      .toDF("day")
    graft.dq.Dq.missingPartitions(dense, col("day")).count() shouldBe 0L
    graft.util.Caches.releaseAll(spark)
  }

  "schemaDrift (D17)" should "classify added/removed/type-changed/kept and measure null-rate drift" in {
    import spark.implicits._
    val old = Seq((1L, 10L, Some("a")), (2L, 20L, Some("b")),
      (3L, 30L, Some("c")), (4L, 40L, Some("d")))
      .toDF("id", "gone", "s")
    val cur = Seq((1L, "x", Some("a")), (2L, "y", None),
      (3L, "z", None), (4L, "w", Some("d")))
      .toDF("id", "s2", "s")
      .select(col("id"), col("s"), col("s2").as("added_col"))
      .withColumn("id", col("id").cast("int")) // type change
    val r = graft.dq.Dq.schemaDrift(old, cur)
      .as[(String, String, Option[String], Option[String],
        Option[Double], Option[Double], Option[Double])]
      .collect().map(t => t._1 -> t).toMap
    r("gone")._2 shouldBe "removed"
    r("gone")._4 shouldBe None
    r("added_col")._2 shouldBe "added"
    r("added_col")._5 shouldBe None
    r("id")._2 shouldBe "type_changed"
    r("id")._3 shouldBe Some("bigint")
    r("id")._4 shouldBe Some("int")
    r("s")._2 shouldBe "kept"
    r("s")._5 shouldBe Some(0.0)
    r("s")._6 shouldBe Some(0.5) // 2 of 4 went NULL
    r("s")._7 shouldBe Some(0.5) // the drift the report exists for
    graft.util.Caches.releaseAll(spark)
  }

  "uniquenessReport (D18)" should "census duplicate keys incl. NULL key values" in {
    import spark.implicits._
    val df = Seq(Some(1L), Some(1L), Some(1L), Some(2L), None, None)
      .toDF("k")
    val r = graft.dq.Dq.uniquenessReport(df, Seq("k"))
      .as[(Long, Long, Long, Long, Long, Boolean)].head()
    // keys: 1 (x3), 2 (x1), NULL (x2) -> 3 keys, 2 dup keys, 5 dup rows
    r shouldBe ((6L, 3L, 2L, 5L, 3L, false))
    val uniq = Seq(1L, 2L, 3L).toDF("k")
    graft.dq.Dq.uniquenessReport(uniq, Seq("k"))
      .as[(Long, Long, Long, Long, Long, Boolean)].head()._6 shouldBe true
    graft.util.Caches.releaseAll(spark)
  }

  "reconcileCounts (D19)" should "report both-side partitions with exact integer tolerance" in {
    import spark.implicits._
    val src = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 1), ("c", 1))
      .toDF("k", "v")
    val dst = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 1), ("b", 2),
      ("d", 1)).toDF("k", "v")
    val r = graft.dq.Dq.reconcileCounts(src, dst, col("k"),
        tolNum = 0, tolDen = 1)
      .as[(String, Long, Long, Long, Option[Double], Boolean)]
      .collect().map(t => t._1 -> t).toMap
    r("a") shouldBe (("a", 3L, 3L, 0L, Some(0.0), true))
    r("b") shouldBe (("b", 1L, 2L, 1L, Some(1.0), false)) // double-load
    r("c") shouldBe (("c", 1L, 0L, -1L, Some(1.0), false)) // lost
    r("d") shouldBe (("d", 0L, 1L, 1L, None, false)) // unexpected
    // 40% tolerance: b's +1 of 1 still fails, a passes
    val tol = graft.dq.Dq.reconcileCounts(src, dst, col("k"), 2, 5)
      .as[(String, Long, Long, Long, Option[Double], Boolean)]
      .collect().map(t => t._1 -> t._6).toMap
    tol("a") shouldBe true
    tol("b") shouldBe false
    graft.util.Caches.releaseAll(spark)
  }

  "freshnessReport (D20)" should "compute exact floor-hour lags and the stale flag" in {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      ("a", ts("2024-01-01 12:00:00")), ("a", ts("2024-01-01 11:00:00")),
      ("b", ts("2024-01-02 11:30:01")),
      ("c", ts("2024-01-02 12:30:00"))) // exactly as-of -> lag 0
      .toDF("g", "ts")
    val r = graft.dq.Dq.freshnessReport(df, col("g"), col("ts"),
        "2024-01-02 12:30:00", maxLagHours = 24)
      .as[(String, Long, java.sql.Timestamp, Long, Boolean)]
      .collect().map(t => t._1 -> t).toMap
    // a: 24.5h since latest -> floor 24, NOT stale at >24
    r("a") shouldBe (("a", 2L, ts("2024-01-01 12:00:00"), 24L, false))
    // 0h59m59s -> floor 0
    r("b")._4 shouldBe 0L
    r("b")._5 shouldBe false
    r("c")._4 shouldBe 0L
    // tighter threshold flips a to stale
    graft.dq.Dq.freshnessReport(df, col("g"), col("ts"),
        "2024-01-02 12:30:00", maxLagHours = 23)
      .filter(col("group") === "a").select(col("is_stale"))
      .as[Boolean].head() shouldBe true
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Dq.benfordTest"

  it should "extract digits exactly and emit all nine rows with hand stats" in {
    // 1xx values x4, 2xx x2, 9xx x1; plus a sub-cent and a NULL (skipped)
    val df = Seq(Some(123.45), Some(150.0), Some(199.99), Some(100.0),
      Some(250.0), Some(275.5), Some(950.0), Some(0.004), None)
      .toDF("v")
    val r = graft.dq.Dq.benfordTest(df, col("v")).orderBy(col("digit"))
      .select("digit", "n", "n_used", "n_skipped")
      .as[(Int, Long, Long, Long)].collect()
    r.map(_._1) shouldBe (1 to 9)          // full spine, zero rows kept
    r.map(_._2).sum shouldBe 7L
    r(0)._2 shouldBe 4L; r(1)._2 shouldBe 2L; r(8)._2 shouldBe 1L
    r(2)._2 shouldBe 0L
    r(0)._3 shouldBe 7L; r(0)._4 shouldBe 2L
    // expected share of digit 1 is log10(2)
    val e1 = graft.dq.Dq.benfordTest(df, col("v"))
      .filter(col("digit") === 1).select("expected").as[Double].head()
    e1 shouldBe math.floor(math.log10(2.0) * 1e6 + 0.5) / 1e6
  }

  it should "not flip the leading digit at a power-of-ten boundary" in {
    // 999.999 rounds to 100000 cents -> digit 1 by the cents contract
    val df = Seq(1000.0, 999.999, 0.01).toDF("v")
    val got = graft.dq.Dq.benfordTest(df, col("v"))
      .filter(col("n") > 0).select("digit").as[Int].collect().sorted
    got shouldBe Array(1) // all three land on digit 1
  }

  behavior of "Dq.joinFanout"

  it should "price the join exactly and name the hottest key" in {
    val l = Seq(Some("a"), Some("a"), Some("b"), None).toDF("k")
    val r = Seq("a", "b", "b", "b").toDF("k")
    val got = graft.dq.Dq.joinFanout(l, r, col("k"), col("k"))
      .select("left_rows", "right_rows", "left_null_keys",
        "right_null_keys", "matched_keys", "max_key", "max_rows",
        "amplification")
      .as[(Long, Long, Long, Long, Long, String, java.math.BigDecimal,
        Double)].head()
    got._1 shouldBe 4L; got._2 shouldBe 4L
    got._3 shouldBe 1L; got._4 shouldBe 0L
    got._5 shouldBe 2L
    got._6 shouldBe "b"                      // 1x3 beats 2x1
    got._7.longValueExact() shouldBe 3L
    got._8 shouldBe 1.25 +- 1e-9             // (2 + 3) / 4
    // the estimate equals the join actually run
    l.join(r.withColumnRenamed("k", "k2"), col("k") === col("k2"))
      .count() shouldBe 5L
  }

  behavior of "Dq.fdViolations"

  it should "compute TANE's g3 on a hand case and certify a real FD" in {
    val df = Seq((1, "a"), (1, "a"), (1, "b"), // group 1: 3 rows, max 2
      (2, "c"), (2, "c"),                      // group 2: holds
      (3, "d")).toDF("k", "v")
    val r = graft.dq.Dq.fdViolations(df, Seq("k"), "v")
      .select("n_rows", "n_groups", "n_violating_groups", "g3_rows",
        "fd_holds")
      .as[(Long, Long, Long, Long, Boolean)].head()
    r shouldBe ((6L, 3L, 1L, 1L, false))
    graft.dq.Dq.fdViolations(df.filter(col("k") =!= 1), Seq("k"), "v")
      .select("fd_holds").as[Boolean].head() shouldBe true
  }

  behavior of "categoricalDrift (D30)"

  it should "match the hand 3/1-vs-1/3 fixture and hit the [0,1] endpoints" in {
    def df(rows: (String, Int)*) =
      rows.flatMap { case (c, n) => Seq.fill(n)(c) }.toDF("cat")
    // p=(0.75,0.25) vs q=(0.25,0.75): tvd=0.5, hellinger=|√.75−√.25|,
    // jsd = 0.75·log2(1.5) − 0.25 = 0.188722 (q6)
    val r = graft.dq.Dq.categoricalDrift(
      df("a" -> 3, "b" -> 1), df("a" -> 1, "b" -> 3), "cat")
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    r._1 shouldBe 4L
    r._2 shouldBe 4L
    r._3 shouldBe 2L
    r._4 shouldBe 0.5 +- 1e-12
    r._5 shouldBe (math.sqrt(0.75) - math.sqrt(0.25)) +- 1e-6
    r._6 shouldBe 0.188722 +- 1e-9
    // identical mixes -> all three zero
    val z = graft.dq.Dq.categoricalDrift(
      df("a" -> 2, "b" -> 5), df("a" -> 2, "b" -> 5), "cat")
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    (z._4, z._5, z._6) shouldBe ((0.0, 0.0, 0.0))
    // disjoint supports -> all three at their upper bound
    val d = graft.dq.Dq.categoricalDrift(
      df("a" -> 3), df("b" -> 4), "cat")
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    (d._4, d._5, d._6) shouldBe ((1.0, 1.0, 1.0))
  }

  it should "fail loud on NULL categories and past the category cap, and stay partition-invariant" in {
    val withNull = Seq(Some("a"), None, Some("b")).toDF("cat")
    val ok = Seq("a", "b").toDF("cat")
    an[Exception] should be thrownBy
      graft.dq.Dq.categoricalDrift(withNull, ok, "cat").collect()
    an[Exception] should be thrownBy
      graft.dq.Dq.categoricalDrift(
        (1 to 40).map(i => s"c$i").toDF("cat"),
        (1 to 40).map(i => s"c$i").toDF("cat"),
        "cat", maxCategories = 10).collect()
    val big = (1 to 500).map(i => s"c${i % 23}").toDF("cat")
    val big2 = (1 to 400).map(i => s"c${(i * 7) % 29}").toDF("cat")
    def run(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame) =
      graft.dq.Dq.categoricalDrift(a, b, "cat")
        .as[(Long, Long, Long, Double, Double, Double)].collect().head
    run(big.coalesce(1), big2.coalesce(1)) shouldBe
      run(big.repartition(11), big2.repartition(5))
  }

  behavior of "andersonDarlingDrift (D29)"

  it should "match the Scholz-Stephens midrank fixture with ties across samples" in {
    // ref=[1,2,3] cur=[2,4]: A2akN = 31/42 = 0.738095 (hand, via the
    // doubled-midrank integer form; equals the float midrank formula
    // to the 1e-9 per-term floor)
    val ref = Seq(1.0, 2.0, 3.0).toDF("v")
    val cur = Seq(2.0, 4.0).toDF("v")
    val r = graft.dq.Dq.andersonDarlingDrift(ref, cur, "v")
      .as[(Long, Long, Option[Double])].collect().head
    r._1 shouldBe 3L
    r._2 shouldBe 2L
    r._3.get shouldBe 0.738095 +- 2e-6 // q6 +- the per-term floor
    // identical samples -> zero statistic
    val s = Seq(1.0, 1.0, 2.0, 3.0, 3.0).toDF("v")
    graft.dq.Dq.andersonDarlingDrift(s, s, "v")
      .as[(Long, Long, Option[Double])].collect()
      .head._3.get shouldBe 0.0 +- 1e-12
    // a single pooled distinct value -> NULL (E = 0 everywhere)
    val one = Seq(5.0, 5.0).toDF("v")
    graft.dq.Dq.andersonDarlingDrift(one, one, "v")
      .as[(Long, Long, Option[Double])].collect()
      .head._3 shouldBe None
  }

  behavior of "nullRateDriftTest (D33)"

  it should "score a hand two-proportion z and NULL out degenerate columns" in {
    // ref 2/10 null, cur 6/10: pooled 0.4, se = sqrt(0.4*0.6*0.2),
    // z = 0.4/0.219089 = 1.825742 (q6)
    val ref = (Seq.fill(8)(Some(1.0)) ++ Seq.fill(2)(None))
      .map(v => (v, "k")).toDF("v", "k")
    val cur = (Seq.fill(4)(Some(1.0)) ++ Seq.fill(6)(None))
      .map(v => (v, "k")).toDF("v", "k")
    val r = graft.dq.Dq.nullRateDriftTest(ref, cur, Seq("v", "k"))
      .as[(String, Long, Long, Long, Long, Option[Double],
        Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().map(x => x._1 -> x).toMap
    r("v")._2 shouldBe 10L
    r("v")._3 shouldBe 2L
    r("v")._5 shouldBe 6L
    r("v")._6 shouldBe Some(0.2)
    r("v")._7 shouldBe Some(0.6)
    r("v")._8 shouldBe Some(0.4)
    val zHand = 0.4 / math.sqrt(0.4 * 0.6 * 0.2)
    r("v")._9 shouldBe Some(math.floor(zHand * 1e6 + 0.5) / 1e6)
    r("v")._10.get should be < 0.07
    // k never NULL on either side: pooled = 0 -> no test to run
    r("k")._9 shouldBe None
    // a missing column fails loud
    an[IllegalArgumentException] should be thrownBy
      graft.dq.Dq.nullRateDriftTest(ref, cur, Seq("nope"))
  }

  behavior of "cramerVonMisesDrift (D31) and kuiperDrift (D32)"

  it should "match hand CvM and Kuiper on a small grid with ties" in {
    // ref=[1,2,3], cur=[2,4]: grid cumulatives (cnr,cnc) =
    // (1,0),(2,1),(3,1),(3,2); d = cnr*2 - cnc*3 = 2,1,3,0
    // CvM: sum l*d^2 = 1*4 + 2*1 + 1*9 + 1*0 = 15; T = 15/(25*3*2)
    //    = 0.1 exactly
    // Kuiper: D+ = 3/6 = 0.5, D- = 0 -> V = 0.5 (= KS here: one-sided)
    val ref = Seq(1.0, 2.0, 3.0).toDF("v")
    val cur = Seq(2.0, 4.0).toDF("v")
    val cvm = graft.dq.Dq.cramerVonMisesDrift(ref, cur, "v")
      .as[(Long, Long, Double)].collect().head
    cvm shouldBe ((3L, 2L, 0.1))
    val ku = graft.dq.Dq.kuiperDrift(ref, cur, "v")
      .as[(Long, Long, Double, Double, Double)].collect().head
    ku shouldBe ((3L, 2L, 0.5, 0.0, 0.5))
    // identical samples -> zero everywhere
    val s = Seq(1.0, 1.0, 2.0, 3.0).toDF("v")
    graft.dq.Dq.cramerVonMisesDrift(s, s, "v")
      .as[(Long, Long, Double)].collect().head._3 shouldBe 0.0
    graft.dq.Dq.kuiperDrift(s, s, "v")
      .as[(Long, Long, Double, Double, Double)].collect()
      .head._5 shouldBe 0.0
  }

  it should "see a both-ends shift KS halves, and stay partition-invariant" in {
    // current CONCENTRATES into the middle: ref leads below (D+ = 0.4
    // at v=40), cur leads above (D- = 0.4 at v=60) — KS sees one 0.4
    // gap, Kuiper adds both sides to 0.8
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    val cur = (41 to 60).flatMap(v => Seq.fill(5)(v.toDouble)).toDF("v")
    val ks = graft.dq.Dq.ksDrift(ref, cur, "v")
      .select("ks_stat").as[Double].collect().head
    val r = graft.dq.Dq.kuiperDrift(ref, cur, "v")
      .as[(Long, Long, Double, Double, Double)].collect().head
    r._3 should be > 0.0
    r._4 should be > 0.0
    r._5 should be > ks * 1.5
    def runs(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame) = (
      graft.dq.Dq.cramerVonMisesDrift(a, b, "v")
        .as[(Long, Long, Double)].collect().head,
      graft.dq.Dq.kuiperDrift(a, b, "v")
        .as[(Long, Long, Double, Double, Double)].collect().head)
    runs(ref.coalesce(1), cur.coalesce(1)) shouldBe
      runs(ref.repartition(7), cur.repartition(11))
    // the drift-family empty-population guard
    val empty = Seq.empty[Double].toDF("v")
    an[IllegalArgumentException] should be thrownBy
      graft.dq.Dq.cramerVonMisesDrift(ref, empty, "v").collect()
    an[IllegalArgumentException] should be thrownBy
      graft.dq.Dq.kuiperDrift(empty, cur, "v").collect()
  }

  it should "fail loud past the exact-DECIMAL pooled-N bound" in {
    // 4·N⁵ must fit DECIMAL(38,0): N ≤ 3.0e7. Past that Spark would
    // NULL the overflowed l·d² products and silently drop terms while
    // DuckDB's HUGEINT errors — the guard turns the divergence into a
    // loud require. 1.6e7 distinct-light rows per side: the aggregate
    // is cheap, the grid is 8 values.
    val side = spark.range(16000000L)
      .select((col("id") % 8).cast("double").as("v"))
    val e = intercept[IllegalArgumentException] {
      graft.dq.Dq.andersonDarlingDrift(side, side, "v").collect()
    }
    e.getMessage should include("3.0e7")
  }

  it should "weight a tail shift far above an equal-mass center shift (same KS) and stay partition-invariant" in {
    // two currents each move 1% of the mass (KS = 0.01 for BOTH): one
    // nudges the center (50 -> 50.5), one sends the top value to the
    // far tail. The 1/(F(1-F)) weight makes the tail move two orders
    // of magnitude louder on AD while KS cannot tell them apart.
    val body = (1 to 500).map(i => (i % 100).toDouble)
    val ref = body.toDF("v")
    val curCenter = (body.filter(_ != 50.0) ++ Seq.fill(5)(50.5))
      .toDF("v")
    val curTail = (body.filter(_ != 99.0) ++ Seq.fill(5)(1000.0))
      .toDF("v")
    def ks(c: org.apache.spark.sql.DataFrame) =
      graft.dq.Dq.ksDrift(ref, c, "v")
        .select("ks_stat").as[Double].collect().head
    def ad(c: org.apache.spark.sql.DataFrame) =
      graft.dq.Dq.andersonDarlingDrift(ref, c, "v")
        .select("a2").as[Double].collect().head
    math.abs(ks(curCenter) - ks(curTail)) should be < 1e-12
    ad(curTail) should be > 50.0 * ad(curCenter) // hand: ~120x
    val big = (1 to 400).map(i => ((i * 13) % 37).toDouble).toDF("v")
    val big2 = (1 to 300).map(i => ((i * 17) % 41).toDouble).toDF("v")
    def run(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame) =
      graft.dq.Dq.andersonDarlingDrift(a, b, "v")
        .as[(Long, Long, Option[Double])].collect().head
    run(big.coalesce(1), big2.coalesce(1)) shouldBe
      run(big.repartition(11), big2.repartition(7))
  }
}
