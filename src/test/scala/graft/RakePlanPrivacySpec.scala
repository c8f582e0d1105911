package graft

import org.apache.spark.sql.functions._

/** Session-6 wave: IPF raking (X159), LSH band planning (X157),
  * boilerplate share (X158), l-diversity (D24) and purged
  * time-series CV folds (F72). */
class RakePlanPrivacySpec extends SparkSpec {
  import spark.implicits._

  behavior of "Dq.lDiversity"

  it should "count low-diversity groups from a hand fixture" in {
    // g1: sensitive {a, b} (nd=2, 3 rows); g2: {a} (nd=1, 2 rows);
    // g3: {a, b, c} (nd=3, 3 rows)
    val df = Seq(
      ("g1", "a"), ("g1", "a"), ("g1", "b"),
      ("g2", "a"), ("g2", "a"),
      ("g3", "a"), ("g3", "b"), ("g3", "c")).toDF("q", "s")
    val r = graft.dq.Dq.lDiversity(df, Seq("q"), "s", ls = Seq(2, 3))
      .orderBy(col("l"))
      .as[(Int, Long, Long, Long, Long, Option[Double])].collect()
    r.length shouldBe 2
    // l=2: only g2 (nd=1) is low -> 1 group, 2 rows
    r(0) shouldBe ((2, 8L, 3L, 1L, 2L, Some(2.0 / 8.0)))
    // l=3: g1 and g2 are low -> 2 groups, 5 rows
    r(1) shouldBe ((3, 8L, 3L, 2L, 5L, Some(5.0 / 8.0)))
  }

  it should "treat an all-NULL sensitive group as diversity 1" in {
    val df = Seq(("g1", Option.empty[String]),
      ("g1", Option.empty[String]), ("g2", Some("a")),
      ("g2", Some("b"))).toDF("q", "s")
    val r = graft.dq.Dq.lDiversity(df, Seq("q"), "s", ls = Seq(2))
      .as[(Int, Long, Long, Long, Long, Option[Double])].collect()
    // g1 has one distinct (NULL) value -> low at l=2
    r.head._4 shouldBe 1L
    r.head._5 shouldBe 2L
  }

  behavior of "Dedup.lshBandPlan"

  it should "compute the exact S-curve value at a dyadic point" in {
    // k=16, b=4, r=4, j=0.5: every multiply is exact in binary:
    // 0.5^4 = 0.0625; (1-0.0625)^4 = 0.9375^2^2 = 0.2275238037109375
    val r = graft.text.Dedup.lshBandPlan(spark, 16, Seq(4))
      .filter(col("j") === 0.5)
      .select(col("p_candidate")).as[Double].collect()
    r.length shouldBe 1
    r.head shouldBe (1.0 - 0.7724761962890625)
  }

  it should "be monotone in j and shift left with more bands" in {
    val rows = graft.text.Dedup.lshBandPlan(spark, 16, Seq(1, 16))
      .as[(Int, Int, Double, Double)].collect()
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val ps = rs.sortBy(_._3).map(_._4)
      ps.zip(ps.tail).foreach { case (a, b) => b should be >= a }
    }
    // at low similarity, many bands catch far more candidates
    val at = rows.filter(_._3 === 0.25).map(r => r._1 -> r._4).toMap
    at(16) should be > (10 * at(1))
    // single band with all rows: P = j^16
    at(1) shouldBe math.pow(0.25, 16) +- 1e-18
  }

  it should "reject band counts that do not divide k" in {
    an[IllegalArgumentException] should be thrownBy
      graft.text.Dedup.lshBandPlan(spark, 16, Seq(3))
  }

  behavior of "Dedup.boilerplateShare"

  it should "score shared lines against distinct content lines" in {
    val docs = Seq(
      (1L, "unique one\ncommon footer\n\ncommon footer"),
      (2L, "unique two\ncommon footer"),
      (3L, "unique three\ncommon footer\nother line"),
      (4L, "   \n\n")).toDF("doc_id", "text")
    val r = graft.text.Dedup.boilerplateShare(docs, "doc_id", "text",
        minDocs = 2)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, Double)].collect()
    // doc 4 has no content lines -> absent
    r.map(_._1) shouldBe Array(1L, 2L, 3L)
    // doc 1: distinct lines {unique one, common footer} -> 1/2
    r(0) shouldBe ((1L, 2L, 1L, 0.5))
    r(1) shouldBe ((2L, 2L, 1L, 0.5))
    // doc 3: {unique three, common footer, other line} -> 1/3
    r(2)._2 shouldBe 3L
    r(2)._3 shouldBe 1L
  }

  it should "ignore leading/trailing whitespace when matching lines" in {
    val docs = Seq((1L, "  footer  "), (2L, "footer"))
      .toDF("doc_id", "text")
    val r = graft.text.Dedup.boilerplateShare(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect()
    r.foreach(_._4 shouldBe 1.0)
  }

  behavior of "Eval.purgedTimeSeriesFolds"

  it should "assign test, purged, embargo and train roles by block" in {
    // 8 days, 4 folds -> 2-day blocks; horizon 1, embargo 1
    val df = (0 until 8).map(d =>
        (d.toLong, java.sql.Timestamp.valueOf(s"2024-01-0${d + 1} 10:00:00")))
      .toDF("id", "ts")
    val r = graft.ml.Eval.purgedTimeSeriesFolds(df, col("id"),
        col("ts"), folds = 4, horizonDays = 1, embargoDays = 1)
      .as[(Long, java.sql.Date, Int, String)].collect()
    r.length shouldBe 8 * 4
    val byFold = r.groupBy(_._3)
    // fold 2 covers days 3-4 (ids 2,3); id 1 purged (label window
    // reaches day 3); id 4 embargoed; rest train
    val f2 = byFold(2).map(x => x._1 -> x._4).toMap
    f2(2L) shouldBe "test"
    f2(3L) shouldBe "test"
    f2(1L) shouldBe "purged"
    f2(4L) shouldBe "embargo"
    f2(0L) shouldBe "train"
    f2(5L) shouldBe "train"
    f2(7L) shouldBe "train"
    // every row appears in every fold with exactly one role
    byFold.values.foreach(_.length shouldBe 8)
    // the four test blocks tile the span
    val testIds = r.filter(_._4 == "test").map(x => (x._3, x._1)).sorted
    testIds shouldBe (1 to 4).flatMap(f =>
      Seq((f, (2 * f - 2).toLong), (f, (2 * f - 1).toLong))).toArray
  }

  it should "fail loud when the span cannot fit the folds" in {
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00")))
      .toDF("id", "ts")
    an[Exception] should be thrownBy
      graft.ml.Eval.purgedTimeSeriesFolds(df, col("id"), col("ts"),
        folds = 4, horizonDays = 1, embargoDays = 1).collect()
  }

  behavior of "Curation.rakeWeights"

  it should "leave an already-balanced table untouched" in {
    // uniform 2x2 cells: every step multiplies by exactly 1
    val df = (1 to 12).map(i =>
        (if (i % 2 == 0) "en" else "fr",
          if (i % 4 < 2) "web" else "book")).toDF("lang", "src")
    val r = graft.curate.Curation.rakeWeights(df, "lang", "src")
      .as[(String, String, Long, Long)].collect()
    r.length shouldBe 4
    r.foreach { case (_, _, n, w) => w shouldBe n * 1000000L }
  }

  it should "balance skewed marginals toward uniform" in {
    val df = (Seq.fill(60)(("en", "web")) ++ Seq.fill(20)(("en", "book"))
      ++ Seq.fill(15)(("fr", "web")) ++ Seq.fill(5)(("fr", "book")))
      .toDF("lang", "src")
    val r = graft.curate.Curation.rakeWeights(df, "lang", "src",
        iterations = 5)
      .as[(String, String, Long, Long)].collect()
    val total = r.map(_._4).sum.toDouble
    val byLang = r.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val bySrc = r.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    byLang.values.foreach { s =>
      (s / total) shouldBe 0.5 +- 0.01
    }
    bySrc.values.foreach { s =>
      (s / total) shouldBe 0.5 +- 0.01
    }
  }

  it should "fail loud on high-cardinality marginals" in {
    val df = (1 to 100).map(i => (s"r$i", s"c$i")).toDF("a", "b")
    an[IllegalArgumentException] should be thrownBy
      graft.curate.Curation.rakeWeights(df, "a", "b", maxCells = 50)
  }
  behavior of "Curation.trainingOrder"

  it should "emit a balanced round-robin permutation, reproducibly" in {
    val docs = (1L to 100L).map(i => Tuple1(i)).toDF("doc_id")
    val r = graft.curate.Curation.trainingOrder(docs, "doc_id", "ep1", 8)
      .as[(Long, Long, Long, Long)].collect()
    r.map(_._2).sorted shouldBe (1L to 100L).toArray // a permutation
    r.foreach { case (_, o, sh, pos) =>
      sh shouldBe (o - 1) % 8
      pos shouldBe (o - 1) / 8
    }
    val sizes = r.groupBy(_._3).values.map(_.size).toSeq
    (sizes.max - sizes.min) should be <= 1
    // reproducible, and partition-invariant
    val again = graft.curate.Curation.trainingOrder(
        docs.repartition(7), "doc_id", "ep1", 8)
      .as[(Long, Long, Long, Long)].collect()
    again.sortBy(_._1) shouldBe r.sortBy(_._1)
    // a different seed is a different epoch permutation
    val ep2 = graft.curate.Curation.trainingOrder(docs, "doc_id", "ep2", 8)
      .as[(Long, Long, Long, Long)].collect()
    ep2.sortBy(_._1).map(_._2) should not be r.sortBy(_._1).map(_._2)
  }
}
