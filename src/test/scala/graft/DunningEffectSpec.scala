package graft

import org.apache.spark.sql.functions._

/** X170 Dunning collocations + F74 Hosmer–Lemeshow + F75 effect size —
  * the round-12 evidence-weighing tier, each pinned on hand-computed
  * values. */
class DunningEffectSpec extends SparkSpec {
  import spark.implicits._

  behavior of "TextStats.dunningCollocations (X170)"

  it should "reproduce the hand-computed G2 on a tiny corpus" in {
    // "a b a b a c": bigrams (a b)x2, (b a)x2, (a c)x1; N = 5.
    // For (a,b): k11=2, cx(a-left)=3, cy(b-right)=2, k12=1, k21=0,
    // k22=2 -> G2 = 2*(2 ln((2/3)(5/2)) + ln((1/3)(5/3)) + 0
    //   + 2 ln((2/2)(5/3)))   [same literal tree as the operator]
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val r = graft.text.TextStats.dunningCollocations(docs, "text",
        minCount = 2)
      .orderBy(col("x"), col("y"))
      .as[(String, String, Long, Long, Long, Double)].collect()
    val ab = r.filter(t => t._1 == "a" && t._2 == "b").head
    ab._3 shouldBe 2L; ab._4 shouldBe 3L; ab._5 shouldBe 2L
    val exp = 2.0 * (2.0 * math.log((2.0 / 3.0) * (5.0 / 2.0)) +
      1.0 * math.log((1.0 / 3.0) * (5.0 / 3.0)) + 0.0 +
      2.0 * math.log((2.0 / 2.0) * (5.0 / 3.0)))
    // llr publishes at p=2 (G² grows ~O(N); q6 would break the
    // quantize 2^53 contract at corpus scale)
    ab._6 shouldBe math.floor(exp * 1e2 + 0.5) / 1e2
    // (b a) is a candidate too; (a c) is under minCount
    r.map(t => (t._1, t._2)).toSet shouldBe Set(("a", "b"), ("b", "a"))
  }

  it should "rank mass over surprise (the anti-PMI property) and stay partition-invariant" in {
    // "x y" co-occurs 30 times inside a 131-bigram corpus of unique
    // fillers; "q z" once between two hapaxes. PMI ranks the hapax
    // pair at the maximum (lift = N); Dunning must weigh the
    // 30-occurrence evidence mass higher.
    val docs = ((1L to 30L).map(i => (i, "x y")) ++
      (1L to 100L).map(i => (100L + i, s"f$i g$i")) ++
      Seq((500L, "q z")))
      .toDF("doc_id", "text")
    def run(parts: Int) = graft.text.TextStats.dunningCollocations(
      docs.repartition(parts), "text", minCount = 1)
      .orderBy(col("x"), col("y"))
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    val r = run(2)
    r shouldBe run(5)
    val xy = r.filter(t => t._1 == "x" && t._2 == "y").head
    val qz = r.filter(t => t._1 == "q" && t._2 == "z").head
    xy._6 should be > qz._6
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Eval.hosmerLemeshow (F74)"

  it should "reproduce hand-computed bins and statistic" in {
    // 8 rows, p = i/10, y = (0,0,0,1,0,1,1,1), 4 buckets of 2:
    // E = (.3,.7,1.1,1.5), O = (0,1,1,2)
    val ys = Seq(0, 0, 0, 1, 0, 1, 1, 1)
    val df = (1 to 8).map(i => (i.toLong, i / 10.0, ys(i - 1)))
      .toDF("id", "p", "y")
    val r = graft.ml.Eval.hosmerLemeshow(df, col("p"), col("y"),
        col("id"), buckets = 4)
      .orderBy(col("bucket"))
      .as[(Long, Long, Long, Double, Double, Double, Int)].collect()
    r.map(_._2) shouldBe Array(2L, 2L, 2L, 2L)
    r.map(_._3) shouldBe Array(0L, 1L, 1L, 2L)
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    r.map(_._4) shouldBe Array(0.3, 0.7, 1.1, 1.5).map(q6)
    val terms = Seq(
      0.09 / (0.3 * (1 - 0.3 / 2)), 0.09 / (0.7 * (1 - 0.7 / 2)),
      0.01 / (1.1 * (1 - 1.1 / 2)), 0.25 / (1.5 * (1 - 1.5 / 2)))
    r.map(_._5) shouldBe terms.map(q6).toArray
    r.map(_._7).toSet shouldBe Set(2)
    // the statistic repeats per row (the ece convention)
    r.map(_._6).toSet.size shouldBe 1
  }

  it should "fail loud on out-of-range probabilities" in {
    val df = Seq((1L, 1.2, 1), (2L, 0.5, 0), (3L, 0.1, 1))
      .toDF("id", "p", "y")
    an[Exception] should be thrownBy
      graft.ml.Eval.hosmerLemeshow(df, col("p"), col("y"), col("id"),
        buckets = 3).collect()
  }

  behavior of "Stats.effectSize (F75)"

  it should "reproduce hand-computed d and g" in {
    // arm0 = (1,2,3): mean 2, var 1; arm1 = (2,4,6): mean 4, var 4.
    // pooled = 2.5, d = 2/sqrt(2.5), J = 1 - 3/15 = 0.8
    val df = (Seq(1, 2, 3).map(v => (0, v.toDouble)) ++
      Seq(2, 4, 6).map(v => (1, v.toDouble))).toDF("variant", "v")
    val r = graft.dq.Stats.effectSize(df, col("variant"), col("v"))
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    r._1 shouldBe 3L; r._2 shouldBe 3L
    r._3 shouldBe 2.0; r._4 shouldBe 4.0
    val d = 2.0 / math.sqrt(2.5)
    r._5 shouldBe q6(d)
    r._6 shouldBe q6(d * 0.8)
  }

  it should "emit NULL d/g on a degenerate arm" in {
    val df = Seq((0, 1.0), (1, 2.0), (1, 3.0)).toDF("variant", "v")
    val row = graft.dq.Stats.effectSize(df, col("variant"), col("v"))
      .collect().head
    row.isNullAt(4) shouldBe true
    row.isNullAt(5) shouldBe true
  }

  behavior of "Eval.cliffsDelta (F77)"

  it should "count dominance pairs exactly with zero-weight ties" in {
    // arm1 = (3, 5), arm0 = (1, 5, 2): gt = {3>1, 3>2, 5>1, 5>2} = 4,
    // lt = {3<5} = 1, the 5=5 tie contributes 0 -> delta = 3/6 = 0.5
    val df = (Seq(3, 5).map(v => (1, v)) ++ Seq(1, 5, 2).map(v => (0, v)))
      .toDF("y", "s")
    val r = graft.ml.Eval.cliffsDelta(df, col("s"), col("y"))
      .as[(Long, Long, Long, Long, Double)].collect().head
    r shouldBe ((2L, 3L, 4L, 1L, 0.5))
  }

  it should "be partition-invariant and NULL on an empty arm" in {
    val df = (1 to 300).map(i => (i % 2, (i * 7) % 23)).toDF("y", "s")
    def run(parts: Int) = graft.ml.Eval.cliffsDelta(
      df.repartition(parts), col("s"), col("y"))
      .as[(Long, Long, Long, Long, Double)].collect().head
    run(2) shouldBe run(9)
    val one = Seq((1, 5), (1, 7)).toDF("y", "s")
    graft.ml.Eval.cliffsDelta(one, col("s"), col("y"))
      .collect().head.isNullAt(4) shouldBe true
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Eval.cochranQ (F76)"

  it should "reproduce the hand-computed statistic and reduce to McNemar chi2 at k=2" in {
    // rows (1,1,0),(1,0,0),(1,1,1),(0,0,0): G=(3,2,1), T=6,
    // sumG2=14, sumL2=14 -> Q = 2*(3*14-36)/(18-14) = 3.0
    val df = Seq((1, 1, 0), (1, 0, 0), (1, 1, 1), (0, 0, 0))
      .toDF("a", "b", "c")
    val r = graft.ml.Eval.cochranQ(df,
      Seq(col("a") === 1, col("b") === 1, col("c") === 1), 5.991)
      .as[(Long, Int, Long, Double, Int)].collect().head
    r._1 shouldBe 4L; r._2 shouldBe 3; r._3 shouldBe 6L
    r._4 shouldBe 3.0; r._5 shouldBe 0
    // k=2 equivalence: Q = (b-c)^2/(b+c) = McNemar's chi2
    val two = Seq((1, 0), (1, 0), (1, 0), (0, 1), (1, 1), (0, 0))
      .toDF("a", "b")
    val q2 = graft.ml.Eval.cochranQ(two,
      Seq(col("a") === 1, col("b") === 1), 3.841)
      .as[(Long, Int, Long, Double, Int)].collect().head._4
    val mc = graft.ml.Eval.mcnemarTest(two, col("a") === 1,
      col("b") === 1).select(col("chi2")).as[Double].collect().head
    q2 shouldBe mc
  }

  it should "emit NULL Q when every row is identical across classifiers" in {
    val df = Seq((1, 1), (0, 0), (1, 1)).toDF("a", "b")
    val row = graft.ml.Eval.cochranQ(df,
      Seq(col("a") === 1, col("b") === 1), 3.841).collect().head
    row.isNullAt(3) shouldBe true
    row.isNullAt(4) shouldBe true
  }

  it should "fail loud on NULL classifier outputs (matched design)" in {
    // pre-guard, count(*) kept the row while the G/L sums dropped it
    // inconsistently — Q silently mixed mismatched populations
    val df = Seq((Some(1), Some(1)), (Some(0), None), (Some(1), Some(0)))
      .toDF("a", "b")
    an[Exception] should be thrownBy
      graft.ml.Eval.cochranQ(df,
        Seq(col("a") === 1, col("b") === 1), 3.841).collect()
  }

  behavior of "Stats.randomizationTest (F81)"

  it should "find a massive effect maximally extreme and a null effect unextreme" in {
    val big = (1L to 40L).map(i =>
      (i, i % 2, (i % 5).toDouble + (if (i % 2 == 1) 1000.0 else 0.0)))
      .toDF("id", "t", "v")
    val r = graft.dq.Stats.randomizationTest(big, col("id"), col("t"),
        col("v"), reps = 20, seed = "s")
      .as[(Long, Int, Double, Long, Double)].collect().head
    r._1 shouldBe 40L
    r._2 shouldBe 20
    r._3 should be > 990.0
    r._4 shouldBe 0L // no re-draw beats a 1000-point true effect
    r._5 shouldBe 1.0 / 21.0
    val nullEff = (1L to 40L).map(i => (i, i % 2, (i % 7).toDouble))
      .toDF("id", "t", "v")
    val p0 = graft.dq.Stats.randomizationTest(nullEff, col("id"),
        col("t"), col("v"), reps = 30, seed = "s")
      .select(col("n_extreme")).as[Long].collect().head
    p0 should be >= 1L
  }

  it should "be a pure function of (seed, id) — rerun- and partition-stable" in {
    val df = (1L to 120L).map(i => (i, i % 2, (i * 13 % 31).toDouble))
      .toDF("id", "t", "v")
    def run(d: org.apache.spark.sql.DataFrame, seed: String) =
      graft.dq.Stats.randomizationTest(d, col("id"), col("t"),
        col("v"), reps = 25, seed = seed)
        .as[(Long, Int, Double, Long, Double)].collect().head
    val a = run(df, "s1")
    run(df.repartition(7), "s1") shouldBe a
    run(df, "s1") shouldBe a
    graft.util.Caches.releaseAll(spark)
  }

  it should "fail loud on NULL unit ids (the draw is keyed on the id)" in {
    // pre-guard, concat_ws skipped the NULL so every NULL-id row
    // shared ONE draw per rep — a silent cross-engine divergence
    val df = Seq((Some(1L), 1, 1.0), (None, 0, 2.0), (Some(3L), 1, 3.0),
      (Some(4L), 0, 4.0)).toDF("id", "t", "v")
    an[Exception] should be thrownBy
      graft.dq.Stats.randomizationTest(df, col("id"), col("t"),
        col("v"), reps = 5, seed = "s").collect()
    graft.util.Caches.releaseAll(spark)
  }
}
