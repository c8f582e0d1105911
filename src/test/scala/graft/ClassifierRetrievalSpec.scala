package graft

import graft.ml.TextClassifier
import graft.text.Retrieval
import org.apache.spark.sql.functions._

/** Closed-form checks for the NB classifier and BM25 ranking — tiny
  * hand-computed corpora where every log-probability and score is
  * derivable on paper. */
class ClassifierRetrievalSpec extends SparkSpec {
  import spark.implicits._

  behavior of "TextClassifier"

  it should "recover hand-computed NB posteriors, argmax and margin" in {
    // V = {a,b,c,d} -> 4; class X: 4 tokens (a:3, b:1), class Y: 3 (c:2, d:1)
    val train = Seq(("a a a b", "X"), ("c c d", "Y")).toDF("text", "lab")
    val model = TextClassifier.train(train, "text", "lab")
    val out = TextClassifier.score(model,
      Seq((1L, "a a"), (2L, "c d")).toDF("doc_id", "text"),
      "doc_id", "text")
      .orderBy("doc_id")
      .collect()
    out.map(_.getString(1)).toSeq shouldBe Seq("X", "Y")
    // doc 1 under X: ln(1/2) + 2*ln((3+1)/(4+4)) = 3 ln 0.5 = -2.0794
    out(0).getDouble(2) shouldBe -2.079 +- 1e-9
    // under Y: ln(1/2) + 2*ln((0+1)/(3+4)) = -4.585; margin 2.506
    out(0).getDouble(3) shouldBe 2.506 +- 1e-9
  }

  it should "smooth unseen tokens instead of zeroing the posterior" in {
    val model = TextClassifier.train(
      Seq(("a a", "X"), ("b b", "Y")).toDF("text", "lab"), "text", "lab")
    val out = TextClassifier.score(model,
      Seq((1L, "zz a")).toDF("doc_id", "text"), "doc_id", "text")
      .collect()
    out.length shouldBe 1
    out(0).getString(1) shouldBe "X" // the seen token decides
  }

  behavior of "Sketches.mergeableDistinct"

  it should "audit HLL estimates and survive the persisted-sketch round trip" in {
    import org.apache.spark.sql.functions.{hll_sketch_agg, hll_sketch_estimate, hll_union_agg}
    val rows = (1L to 60000L).map(i => (i % 3, s"v${i % 20011}"))
      .toDF("g", "tok")
    val rep = graft.sketch.Sketches.mergeableDistinct(rows, "g", "tok",
        col("tok").substr(2, 1).cast("long") % 2)
      .collect()
    rep.length shouldBe 3
    all(rep.map(_.getBoolean(2))) shouldBe true // estimate within 5%
    all(rep.map(_.getBoolean(3))) shouldBe true // split-merge consistent
    // the production pattern: per-batch sketch tables PERSISTED as
    // binary, merged later without the raw data
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_sketch_tbl"
    rows.filter(col("g") =!= 2).groupBy("g")
      .agg(hll_sketch_agg(col("tok")).as("sk"))
      .write.mode("overwrite").parquet(dir)
    rows.filter(col("g") === 2).groupBy("g")
      .agg(hll_sketch_agg(col("tok")).as("sk"))
      .write.mode("append").parquet(dir)
    val merged = spark.read.parquet(dir)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val onePass = rows
      .agg(hll_sketch_estimate(hll_sketch_agg(col("tok"))).as("est"))
      .head().getLong(0)
    merged shouldBe onePass // register maxes commute through storage
  }

  it should "report the exact interpolated median and pass GK rank audits" in {
    val rows = (1 to 100).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val r = graft.sketch.Sketches.quantileReport(rows, "grp", "v").head()
    r.getLong(1) shouldBe 100L
    r.getDouble(2) shouldBe 50.5 +- 1e-9 // type-7 median of 1..100
    r.getBoolean(3) shouldBe true
    r.getBoolean(4) shouldBe true
    r.getBoolean(5) shouldBe true
  }

  behavior of "Embeddings.randomProject"

  it should "be deterministic and preserve cluster separation (JL)" in {
    // 3 clusters at mutually distant 64-d centers, ±0.1 deterministic
    // noise; after 64→16 the worst JL distortion at this dOut cannot
    // bring a ~28-unit cross-cluster gap under a ~0.4-unit within gap
    val pts = for (c <- 0 until 3; p <- 0 until 4) yield {
      val id = (c * 4 + p).toLong
      val v = Array.tabulate(64) { i =>
        val center = if (i / 8 == c * 2) 20.0 else 0.0
        center + (if ((i + p) % 2 == 0) 0.1 else -0.1)
      }
      (id, v)
    }
    val df = pts.toDF("vec_id", "embedding")
    def proj(): Map[Long, Array[Double]] =
      graft.ann.Embeddings.randomProject(df, "vec_id", "embedding", 64, 16)
        .collect()
        .groupBy(_.getLong(0))
        .map { case (id, rows) =>
          id -> rows.sortBy(_.getLong(1)).map(_.getDouble(2)) }
    val p1 = proj()
    proj().map { case (k, v) => k -> v.toSeq } shouldBe
      p1.map { case (k, v) => k -> v.toSeq } // same matrix every run
    def d(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val ids = pts.map(_._1)
    val within = for (a <- ids; b <- ids if a < b && a / 4 == b / 4)
      yield d(p1(a), p1(b))
    val cross = for (a <- ids; b <- ids if a < b && a / 4 != b / 4)
      yield d(p1(a), p1(b))
    within.max should be < cross.min
  }

  behavior of "Eval.thresholdSweep"

  it should "compute exact cumulative keep counts and precision per cutoff" in {
    val scored = Seq(
      (Some(0.0), true), (Some(0.25), false), (Some(0.5), true),
      (Some(1.0), true), (None, true)) // NULL score excluded
      .toDF("m", "ok")
    val r = graft.ml.Eval.thresholdSweep(spark, scored, "m", "ok", 2)
      .orderBy("bucket").collect()
    r.map(_.getLong(0)).toSeq shouldBe Seq(0L, 1L)
    r.map(_.getDouble(1)).toSeq shouldBe Seq(0.0, 0.5)       // thresholds
    r.map(_.getLong(2)).toSeq shouldBe Seq(4L, 2L)           // n_kept
    r.map(_.getLong(3)).toSeq shouldBe Seq(3L, 2L)           // correct kept
    r(0).getDouble(4) shouldBe 0.75 +- 1e-12
    r(1).getDouble(4) shouldBe 1.0 +- 1e-12
  }

  it should "collapse a zero-spread score column into bucket 0" in {
    val scored = Seq((0.7, true), (0.7, false)).toDF("m", "ok")
    val r = graft.ml.Eval.thresholdSweep(spark, scored, "m", "ok", 4)
      .orderBy("bucket").collect()
    r.length shouldBe 4
    r(0).getLong(2) shouldBe 2L  // everything in bucket 0
    r(1).getLong(2) shouldBe 0L
  }

  behavior of "Retrieval.bm25TopK"

  it should "rank by hand-computed BM25 and drop non-matching docs" in {
    val corpus = Seq((1L, "a a b"), (2L, "a c"), (3L, "b c"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(spark, corpus, "doc_id", "text",
      Seq("q" -> "a"), k = 5)
      .orderBy("rank").collect()
    // N=3, avgdl=7/3, df(a)=2, idf=ln(1.6); doc3 never matches
    out.map(_.getLong(1)).toSeq shouldBe Seq(1L, 2L)
    out(0).getDouble(3) shouldBe 0.5982 +- 1e-9
    out(1).getDouble(3) shouldBe 0.4992 +- 1e-9
  }

  it should "treat repeated query terms as a set and honour k" in {
    val corpus = Seq((1L, "a b"), (2L, "a a"), (3L, "a"), (4L, "a a a"))
      .toDF("doc_id", "text")
    val once = Retrieval.bm25TopK(spark, corpus, "doc_id", "text",
      Seq("q" -> "a"), k = 2).collect()
    val twice = Retrieval.bm25TopK(spark, corpus, "doc_id", "text",
      Seq("q" -> "a a"), k = 2).collect()
    once.length shouldBe 2
    once.map(r => (r.getLong(1), r.getDouble(3))).toSeq shouldBe
      twice.map(r => (r.getLong(1), r.getDouble(3))).toSeq
  }

  behavior of "Eval.calibrationCurve (F15)"

  it should "match a hand-computed reliability diagram and ECE" in {
    val scored = Seq((0.1, false), (0.2, true), (0.8, true),
      (0.9, true)).toDF("m", "ok")
    val rows = graft.ml.Eval.calibrationCurve(spark, scored, "m", "ok",
        nBuckets = 2)
      .select(col("bucket"), col("n"), col("n_correct"),
        col("observed_acc"), col("mean_score"), col("gap"), col("ece"))
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    // bucket 0 = [0.1, 0.5): {0.1 wrong, 0.2 right}; bucket 1: both ok
    rows(0L) shouldBe ((0L, 2L, 1L, 0.5, 0.15, 0.35, 0.25))
    rows(1L)._4 shouldBe 1.0
    rows(1L)._5 shouldBe 0.85
    rows(1L)._6 shouldBe 0.15
    rows(1L)._7 shouldBe 0.25 // ece = .5*.35 + .5*.15
  }

  it should "report zero ECE for a perfectly calibrated degenerate score" in {
    val scored = Seq((0.5, true), (0.5, false)).toDF("m", "ok")
    val r = graft.ml.Eval.calibrationCurve(spark, scored, "m", "ok", 5)
      .select(col("n"), col("observed_acc"), col("mean_score"),
        col("ece"))
      .as[(Long, Double, Double, Double)].collect()
    r.length shouldBe 1 // step 0 collapses to one bucket
    r.head shouldBe ((2L, 0.5, 0.5, 0.0))
  }

  behavior of "rrfFuse (X89)"

  it should "fuse hand-computed reciprocal ranks with single-list docs scored once" in {
    val lex = Seq(("q", 1L, 1L), ("q", 2L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val sem = Seq(("q", 2L, 1L), ("q", 3L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(lex, sem, k = 10)
      .collect().map(r => r.getLong(1) ->
        ((Option(r.get(2)), Option(r.get(3)), r.getDouble(4),
          r.getLong(5)))).toMap
    // d2 in both lists: 1/62 + 1/61; d1 lex-only 1/61; d3 sem-only 1/62
    got(2L)._3 shouldBe (1.0 / 62 + 1.0 / 61) +- 1e-15
    got(1L)._3 shouldBe 1.0 / 61 +- 1e-15
    got(3L)._3 shouldBe 1.0 / 62 +- 1e-15
    got(2L)._4 shouldBe 1L // fused winner appears in both rankings
    got(1L)._4 shouldBe 2L
    got(3L)._4 shouldBe 3L
    got(1L)._2 shouldBe None // absent from the semantic list
    got(3L)._1 shouldBe None // absent from the lexical list
  }

  "learningCurve (F19)" should "use nested slices of the train pool against one fixed test split" in {
    // classes alternate in 16-blocks: both appear in every nested
    // slice (k=1 selects ids {0,16,32,48} -> f,m,f,m) and in the
    // held-out odd split
    val docs = (0 until 64).map { i =>
      if ((i / 16) % 2 == 0) (i.toLong, "apple banana cherry", "f")
      else (i.toLong, "iron copper zinc", "m")
    }.toDF("doc_id", "text", "lang")
    val r = graft.ml.TextClassifier
      .learningCurve(docs, "doc_id", "text", "lang")
      .select(col("train_slots"), col("n_train"), col("n_test"),
        col("accuracy"))
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    r.map(_._1).toSeq shouldBe Seq(1, 2, 4, 8)
    // nested slices grow monotonically; full slice = the whole pool
    r.map(_._2).toSeq shouldBe r.map(_._2).toSeq.sorted
    r.last._2 shouldBe 32L
    // same held-out split every time
    r.map(_._3).distinct.toSeq shouldBe Seq(32L)
    // separable vocab: perfect already at the smallest slice
    r.foreach(_._4 shouldBe 1.0)
  }

  "brierLogLoss (F21)" should "score near-zero on separable classes and count unseen-class docs out" in {
    val train = (0 until 20).map { i =>
      if (i % 2 == 0) (i.toLong, "apple banana cherry", "f")
      else (i.toLong, "iron copper zinc", "m")
    }.toDF("doc_id", "text", "lang")
    val test = Seq(
      (100L, "apple banana", "f"),
      (101L, "iron zinc", "m"),
      (102L, "apple banana", "x")) // class never trained: unscored
      .toDF("doc_id", "text", "lang")
    val model = graft.ml.TextClassifier.train(train, "text", "lang")
    val r = graft.ml.TextClassifier.brierLogLoss(model, test,
        "doc_id", "text", "lang")
      .as[(Long, Long, Double, Double)].head()
    r._1 shouldBe 2L
    r._2 shouldBe 1L
    r._3 should be < 0.05 // confident and correct
    r._4 should be < 0.05
    r._3 should be >= 0.0
    r._4 should be >= 0.0
  }

  "suspectLabels (X112)" should "flag a planted mislabel out-of-fold and nothing else" in {
    val clean = (0 until 30).map { i =>
      if (i % 2 == 0) (i.toLong, "apple banana cherry fruit", "f")
      else (i.toLong, "iron copper zinc metal", "m")
    }
    // doc 100: metal text labeled 'f' — the planted mislabel
    val docs = (clean :+ ((100L, "iron copper zinc metal", "f")))
      .toDF("doc_id", "text", "lang")
    val sus = graft.ml.TextClassifier.suspectLabels(docs, "doc_id",
        "text", "lang", folds = 3, minMargin = 0.5)
      .select(col("doc_id"), col("given"), col("predicted"))
      .as[(Long, String, String)].collect()
    sus.map(_._1).toSet shouldBe Set(100L)
    sus.head._2 shouldBe "f"
    sus.head._3 shouldBe "m"
  }

  "crossValidate (X103)" should "partition docs into disjoint exhaustive folds and separate easy classes" in {
    // two trivially separable vocabularies
    val docs = (0 until 30).map { i =>
      if (i % 2 == 0) (i.toLong, "apple banana cherry fruit", "f")
      else (i.toLong, "iron copper zinc metal", "m")
    }.toDF("doc_id", "text", "lang")
    val cv = graft.ml.TextClassifier
      .crossValidate(docs, "doc_id", "text", "lang", folds = 3)
      .select(col("fold"), col("n_docs"), col("accuracy"))
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    cv.map(_._1).toSeq shouldBe Seq(0, 1, 2)
    cv.map(_._2).sum shouldBe 30L // every doc tested exactly once
    cv.foreach(_._3 shouldBe 1.0) // separable -> perfect per fold
  }

  "classReport (F18)" should "compute guarded per-class precision/recall/F1 from a known confusion" in {
    val preds = Seq(
      ("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"), ("c", "a"),
      ("a", "d"))
      .toDF("truth", "pred")
    val r = graft.ml.TextClassifier.classReport(preds, "truth", "pred")
      .select(col("label"), col("n_true"), col("n_pred"), col("tp"),
        col("precision"), col("recall"), col("f1"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double],
        Option[Double])].collect().map(t => t._1 -> t).toMap
    r("a") shouldBe (("a", 3L, 2L, 1L, Some(0.5), Some(1.0 / 3),
      Some(2.0 * 0.5 * (1.0 / 3) / (0.5 + 1.0 / 3))))
    r("b") shouldBe (("b", 2L, 3L, 2L, Some(2.0 / 3), Some(1.0),
      Some(2.0 * (2.0 / 3) * 1.0 / (2.0 / 3 + 1.0))))
    // never predicted: precision undefined, recall 0, f1 undefined
    r("c") shouldBe (("c", 1L, 0L, 0L, None, Some(0.0), None))
    // never true: recall undefined
    r("d") shouldBe (("d", 0L, 1L, 0L, Some(0.0), None, None))
    graft.util.Caches.releaseAll(spark)
  }

  it should "tie-break equal fused scores by doc_id and honour k" in {
    // d5 lex-rank 1 only, d4 sem-rank 1 only: identical scores
    val lex = Seq(("q", 5L, 1L)).toDF("query_id", "doc_id", "rank")
    val sem = Seq(("q", 4L, 1L)).toDF("query_id", "doc_id", "rank")
    val rows = Retrieval.rrfFuse(lex, sem, k = 10)
      .select(col("doc_id"), col("rank")).as[(Long, Long)]
      .collect().toMap
    rows(4L) shouldBe 1L
    rows(5L) shouldBe 2L
    Retrieval.rrfFuse(lex, sem, k = 1).count() shouldBe 1L
  }

  behavior of "Eval.liftTable (F28)"

  it should "compute hand-checked decile capture and lift on a separable score" in {
    import spark.implicits._
    // 20 rows, top-scored 5 are ALL the positives: with 4 buckets,
    // bucket 1 (rows 1-5) holds every positive
    val rows = (1 to 20).map(i =>
      (21.0 - i, if (i <= 5) 1 else 0, i.toLong))
      .toDF("s", "y", "id")
    val r = graft.ml.Eval.liftTable(rows, col("s"), col("y"), col("id"),
        buckets = 4)
      .as[(Long, Long, Long, Double, Long, Option[Double],
        Option[Double])].collect().sortBy(_._1)
    r.length shouldBe 4
    r(0)._2 shouldBe 5L
    r(0)._3 shouldBe 5L
    r(0)._4 shouldBe 1.0
    r(0)._6 shouldBe Some(1.0)          // bucket 1 captures 100%
    r(0)._7.get shouldBe 4.0 +- 1e-12   // rate 1.0 vs base 0.25
    r(1)._3 shouldBe 0L
    r(1)._6 shouldBe Some(1.0)          // capture stays at 100%
    r(3)._7 shouldBe Some(0.0)
    // no positives at all: capture/lift NULL, never a division error
    val none = (1 to 8).map(i => (i.toDouble, 0, i.toLong))
      .toDF("s", "y", "id")
    graft.ml.Eval.liftTable(none, col("s"), col("y"), col("id"),
        buckets = 2)
      .select(col("capture")).as[Option[Double]].collect()
      .foreach(_ shouldBe None)
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Eval.mcnemarTest (F27)"

  it should "compute the hand-checked discordant-pair statistic and NULL on no evidence" in {
    import spark.implicits._
    // contingency: both 4, a-only 3, b-only 1, neither 2
    // z = (3-1)/sqrt(4) = 1.0, chi2 = 1.0, not significant
    val rows = (Seq.fill(4)((true, true)) ++ Seq.fill(3)((true, false))
      ++ Seq.fill(1)((false, true)) ++ Seq.fill(2)((false, false)))
      .toDF("oka", "okb")
    val r = graft.ml.Eval.mcnemarTest(rows, col("oka"), col("okb"))
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Int])].head()
    r._1 shouldBe 4L
    r._2 shouldBe 3L
    r._3 shouldBe 1L
    r._4 shouldBe 2L
    r._5.get shouldBe 1.0 +- 1e-15
    r._6.get shouldBe 1.0 +- 1e-15
    r._7 shouldBe Some(0)
    // perfectly concordant classifiers: no discordant pairs -> NULLs
    val same = Seq((true, true), (false, false)).toDF("oka", "okb")
    val s = graft.ml.Eval.mcnemarTest(same, col("oka"), col("okb"))
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Int])].head()
    s._5 shouldBe None
    s._7 shouldBe None
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Retrieval.retrievalMetrics (F23)"

  it should "compute hand-checked p@k, recall, RR, DCG and NDCG incl. the no-relevant query" in {
    import spark.implicits._
    // q1: retrieved [1,2,3], relevant {2, 9} -> hits 1, p 1/3,
    // recall 1/2, rr 1/2, dcg = 1/log2(3), idcg = 1 + 1/log2(3)
    // q2: retrieved [4], relevant {4} -> perfect
    // q3: retrieved [5], nothing relevant anywhere
    val results = Seq(("q1", 1L, 1L), ("q1", 2L, 2L), ("q1", 3L, 3L),
      ("q2", 4L, 1L), ("q3", 5L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val labels = Seq(("q1", 2L), ("q1", 9L), ("q2", 4L))
      .toDF("query_id", "doc_id")
    val r = graft.text.Retrieval.retrievalMetrics(results, labels,
        k = 3)
      .as[(String, Long, Long, Double, Option[Double], Double,
        Double, Option[Double])].collect()
      .map(t => t._1 -> t).toMap
    val dcg1 = 1.0 / (math.log(3.0) / math.log(2.0))
    r("q1")._2 shouldBe 2L
    r("q1")._3 shouldBe 1L
    r("q1")._4 shouldBe (1.0 / 3) +- 1e-15
    r("q1")._5.get shouldBe 0.5 +- 1e-15
    r("q1")._6 shouldBe 0.5 +- 1e-15
    r("q1")._7 shouldBe dcg1 +- 1e-6
    r("q1")._8.get shouldBe (dcg1 / (1.0 + dcg1)) +- 1e-6
    r("q2")._8.get shouldBe 1.0
    r("q2")._6 shouldBe 1.0
    r("q3")._5 shouldBe None // no relevant docs: NULL, not an error
    r("q3")._6 shouldBe 0.0
    r("q3")._8 shouldBe None
    graft.util.Caches.releaseAll(spark)
  }

  it should "emit a zero-metric row for a query with no results at rank <= k" in {
    import spark.implicits._
    // q4 has relevant docs but its only result ranks beyond k: the
    // worst-failing query must appear with zeros, not vanish
    val results = Seq(("q1", 1L, 1L), ("q4", 9L, 7L))
      .toDF("query_id", "doc_id", "rank")
    val labels = Seq(("q1", 1L), ("q4", 9L)).toDF("query_id", "doc_id")
    val r = graft.text.Retrieval.retrievalMetrics(results, labels, k = 3)
      .as[(String, Long, Long, Double, Option[Double], Double,
        Double, Option[Double])].collect()
      .map(t => t._1 -> t).toMap
    r.keySet should contain("q4")
    r("q4")._2 shouldBe 1L   // n_rel survives
    r("q4")._3 shouldBe 0L   // zero hits
    r("q4")._4 shouldBe 0.0  // p@k
    r("q4")._5.get shouldBe 0.0 // recall
    r("q4")._6 shouldBe 0.0  // reciprocal rank
    r("q4")._7 shouldBe 0.0  // dcg
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Eval.rocAuc (F22)"

  it should "hit the exact endpoints and a hand-computed tied case" in {
    import spark.implicits._
    def auc(rows: Seq[(Double, Int)]): Option[Double] =
      graft.ml.Eval.rocAuc(rows.toDF("s", "y"), col("s"), col("y"))
        .select(col("auc")).as[Option[Double]].head()
    // perfectly separable
    auc(Seq((1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1))) shouldBe Some(1.0)
    // perfectly inverted
    auc(Seq((4.0, 0), (3.0, 0), (1.0, 1), (2.0, 1))).get shouldBe 0.0
    // all scores tied -> exactly chance
    auc(Seq((5.0, 1), (5.0, 1), (5.0, 0), (5.0, 0))) shouldBe Some(0.5)
    // ties across classes: scores (1-,2+,2-,3+): ranks 1, 2.5, 2.5, 4
    // U = (2.5 + 4) - 2*3/2 = 3.5 -> AUC = 3.5/4
    auc(Seq((1.0, 0), (2.0, 1), (2.0, 0), (3.0, 1)))
      .get shouldBe 0.875 +- 1e-15
    // one-class input -> NULL, not a division error
    auc(Seq((1.0, 1), (2.0, 1))) shouldBe None
    graft.util.Caches.releaseAll(spark)
  }

  it should "match a driver-side reference AUC on random scores under any partitioning" in {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val rows = (1 to 600).map(_ =>
      (rnd.nextInt(40) / 4.0, if (rnd.nextBoolean()) 1 else 0))
    // reference: average ranks, Mann-Whitney
    val sorted = rows.sortBy(_._1)
    val ranks = scala.collection.mutable.Map.empty[Double, Double]
    sorted.zipWithIndex.groupBy(_._1._1).foreach { case (s, xs) =>
      ranks(s) = xs.map(_._2 + 1).sum.toDouble / xs.size
    }
    val np = rows.count(_._2 == 1)
    val nn = rows.size - np
    val expected = (rows.filter(_._2 == 1).map(r => ranks(r._1)).sum -
      np.toDouble * (np + 1) / 2) / (np.toDouble * nn)
    Seq(1, 7, 13).foreach { parts =>
      graft.ml.Eval.rocAuc(rows.toDF("s", "y").repartition(parts),
          col("s"), col("y"))
        .select(col("auc")).as[Double].head() shouldBe
        expected +- 1e-12
    }
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Eval.regressionMetrics (F32)"

  it should "match hand-computed MAE/RMSE/R2 and guard the MAPE zero labels" in {
    import spark.implicits._
    // (pred, label): errors 0,-1,1,4 -> mae 1.5, rmse sqrt(4.5);
    // sst = 14 - 36/4 = 5 -> r2 = 1 - 18/5 = -2.6;
    // mape over y!=0: (0 + 1/3 + 1/2)/3, one excluded zero label
    val df = Seq((1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (4.0, 0.0))
      .toDF("p", "y")
    val r = graft.ml.Eval.regressionMetrics(df, col("p"), col("y"))
      .as[(Long, Double, Double, Option[Double], Option[Double], Long)]
      .head()
    r._1 shouldBe 4L
    r._2 shouldBe 1.5
    r._3 shouldBe math.sqrt(4.5) +- 1e-15
    r._4.get shouldBe -2.6 +- 1e-12
    r._5.get shouldBe (0.0 + 1.0 / 3 + 0.5) / 3 +- 1e-15
    r._6 shouldBe 1L
    graft.util.Caches.releaseAll(spark)
  }

  it should "NULL r2 on a constant label and mape when every label is zero" in {
    import spark.implicits._
    val const = Seq((1.0, 5.0), (2.0, 5.0)).toDF("p", "y")
    val rc = graft.ml.Eval.regressionMetrics(const, col("p"), col("y"))
      .as[(Long, Double, Double, Option[Double], Option[Double], Long)]
      .head()
    rc._4 shouldBe None // SST = 0
    val zeros = Seq((1.0, 0.0), (2.0, 0.0)).toDF("p", "y")
    val rz = graft.ml.Eval.regressionMetrics(zeros, col("p"), col("y"))
      .as[(Long, Double, Double, Option[Double], Option[Double], Long)]
      .head()
    rz._5 shouldBe None
    rz._6 shouldBe 2L
    // null rows are dropped before every metric, not zero-filled
    val withNull = Seq((Some(1.0), Some(1.0)), (None, Some(9.0)),
      (Some(9.0), None)).toDF("p", "y")
    graft.ml.Eval.regressionMetrics(withNull, col("p"), col("y"))
      .select(col("n"), col("mae")).as[(Long, Double)]
      .head() shouldBe ((1L, 0.0))
    graft.util.Caches.releaseAll(spark)
  }
}
