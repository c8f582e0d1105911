package graft

import graft.ann.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f)),   // close to 1
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(0.0f, 0.9f, 0.1f)))   // close to 3
    .toDF("vec_id", "embedding")

  it should "evaluate the native codegen dot identically to the UDF and via SQL" in {
    graft.functions.DotProductExpr.register(spark)
    val v = col("embedding").cast("array<double>")
    val rows = vecs.select(
        Similarity.dot(v, v, 3).as("u"),
        Similarity.nativeDot(v, v).as("n"))
      .as[(Double, Double)].collect()
    rows.foreach { case (u, n) => n shouldBe u } // bit-identical
    // pure-SQL surface after registration
    spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head() shouldBe 11.0
    // ragged inputs truncate to the shorter length, like the UDF
    spark.sql("SELECT graft_dot(array(2.0d, 5.0d), array(3.0d)) AS d")
      .as[Double].head() shouldBe 6.0
    // NULL in -> NULL out
    spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d")
      .select(col("d").isNull).as[Boolean].head() shouldBe true
    // the SparkSessionExtensions entry point installs without error
    noException should be thrownBy
      new graft.GraftExtensions().apply(
        new org.apache.spark.sql.SparkSessionExtensions)
  }

  it should "rank exact cosine neighbors correctly" in {
    val top1 = Similarity.bruteForceTopK(vecs, vecs, "vec_id", "embedding", 1, 3)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toMap
    top1(1L) shouldBe 2L
    top1(2L) shouldBe 1L
    top1(3L) shouldBe 4L
    top1(4L) shouldBe 3L
  }

  it should "assign vectors to their nearest centroid" in {
    val centroids = vecs.filter(col("vec_id").isin(1, 3))
    val asg = Similarity.ivfAssign(vecs, "vec_id", "embedding", centroids, 3)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    asg shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L)
  }

  it should "restrict IVF search to the bucket" in {
    val centroids = vecs.filter(col("vec_id").isin(1, 3))
    val r = Similarity.ivfTopK(vecs, "vec_id", "embedding", centroids, 3, 3)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect()
    // buckets are {1,2} and {3,4}: each vector sees exactly 1 neighbor
    r.length shouldBe 4
    r.toMap.apply(1L) shouldBe 2L
    r.toMap.apply(3L) shouldBe 4L
  }

  it should "recover cross-bucket neighbors with multi-probe search" in {
    // vec 5 sits between the two clusters, slightly closer to centroid 1:
    // single-probe search never sees its true near-neighbor set on the
    // other side of the boundary; probing 2 buckets does
    val straddler = vecs.unionByName(
      Seq((5L, Array(0.7f, 0.68f, 0.0f))).toDF("vec_id", "embedding"))
    val centroids = straddler.filter(col("vec_id").isin(1, 3))
    val one = Similarity.ivfTopK(straddler, "vec_id", "embedding",
      centroids, 4, 3)
      .filter(col("vec_id") === 5L)
      .select("neighbor_id").as[Long].collect().toSet
    val two = Similarity.ivfTopKMultiProbe(straddler, "vec_id", "embedding",
      centroids, 4, 3, probes = 2)
      .filter(col("vec_id") === 5L)
      .select("neighbor_id").as[Long].collect().toSet
    one shouldBe Set(1L, 2L)            // own bucket only
    two shouldBe Set(1L, 2L, 3L, 4L)    // both probed buckets
    // probes = 1 degenerates to single-bucket search for every vector
    val p1 = Similarity.ivfTopKMultiProbe(straddler, "vec_id", "embedding",
      centroids, 4, 3, probes = 1)
      .select("vec_id", "rk", "neighbor_id", "cosine")
      .collect().map(_.toString).sorted.toSeq
    val base = Similarity.ivfTopK(straddler, "vec_id", "embedding",
      centroids, 4, 3)
      .select("vec_id", "rk", "neighbor_id", "cosine")
      .collect().map(_.toString).sorted.toSeq
    p1 shouldBe base
  }

  it should "train centroids that balance buckets better than the subset heuristic" in {
    // three tight planted clusters with very different subset-draw
    // densities: every 7th vector as a "centroid" lands them all in one
    // cluster, k-means pulls one centroid into each
    val rnd = new scala.util.Random(7)
    def jitter(base: Array[Double]): Array[Double] =
      base.map(_ + rnd.nextDouble() * 0.05)
    val data = ((1 to 40).map(i => (i.toLong, jitter(Array(1.0, 0.0, 0.0)))) ++
      (41 to 60).map(i => (i.toLong, jitter(Array(0.0, 1.0, 0.0)))) ++
      (61 to 80).map(i => (i.toLong, jitter(Array(0.0, 0.0, 1.0)))))
      .toDF("vec_id", "embedding")
    def sizes(cents: org.apache.spark.sql.DataFrame): Seq[Long] =
      Similarity.ivfAssign(data, "vec_id", "embedding", cents, 3)
        .groupBy("centroid_id").count().select("count").as[Long].collect().toSeq
    def variance(xs: Seq[Long]): Double = {
      val all = xs.padTo(3, 0L) // unused centroids hold zero vectors
      val m = all.sum.toDouble / all.size
      all.map(x => (x - m) * (x - m)).sum / all.size
    }
    val heuristic = data.filter(col("vec_id") % 27 === 1) // 1, 28 — cluster 1 twice... and 55
    val trained = Similarity.trainCentroids(data, "vec_id", "embedding",
      k = 3, iters = 3, dim = 3)
    trained.count() shouldBe 3L
    val vTrained = variance(sizes(
      trained.select(col("vec_id"), col("embedding"))))
    val vHeuristic = variance(sizes(heuristic))
    vTrained should be < vHeuristic
    // with one centroid per planted cluster the buckets are exact
    sizes(trained).sorted shouldBe Seq(20L, 20L, 40L)
  }

  it should "find only above-threshold near-duplicate pairs" in {
    val pairs = Similarity.cosineNearDuplicates(vecs, "vec_id", "embedding", 0.9, 3)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    pairs shouldBe Set((1L, 2L), (3L, 4L))
  }

  it should "find in-bucket near-duplicate pairs without metadata blocking" in {
    val centroids = vecs.filter(col("vec_id").isin(1, 3))
    // buckets {1,2} and {3,4}: both planted pairs are in-bucket, found
    // once each (normalized a < b, deduped across probe orientations)
    val pairs = Similarity.ivfCosineNearDuplicates(vecs, "vec_id",
      "embedding", centroids, 0.9, 3, probes = 2)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    pairs.toSet shouldBe Set((1L, 2L), (3L, 4L))
    pairs.length shouldBe 2 // no duplicate orientations survive
    graft.util.Caches.releaseAll(spark)
  }

  it should "product-quantize onto matching centroids and rank ADC neighbors" in {
    import graft.ann.ProductQuantization
    // 8 dims, 2 subspaces of 4; hand-built codebooks with exact matches
    val codebooks = Seq(
      (0, 0L, Seq(0.0, 0.0, 0.0, 0.0)), (0, 1L, Seq(1.0, 1.0, 1.0, 1.0)),
      (1, 0L, Seq(0.0, 0.0, 0.0, 0.0)), (1, 1L, Seq(2.0, 2.0, 2.0, 2.0)))
      .toDF("subspace", "centroid_id", "centroid")
    val vecs8 = Seq(
      (1L, Array(0.0, 0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 2.0)),
      (2L, Array(1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0)),
      (3L, Array(0.9, 0.9, 0.9, 0.9, 0.0, 0.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val enc = ProductQuantization.encode(vecs8, "vec_id", "embedding",
      codebooks, 2)
    val byId = enc.select("vec_id", "codes", "sq_err")
      .as[(Long, Seq[Long], Double)].collect().map(r => r._1 -> r).toMap
    byId(1L)._2 shouldBe Seq(0L, 1L)
    byId(1L)._3 shouldBe 0.0
    byId(2L)._2 shouldBe Seq(1L, 0L)
    byId(3L)._2 shouldBe Seq(1L, 0L) // 0.9s closer to the ones centroid
    byId(3L)._3 shouldBe (0.04 +- 1e-9)
    // ADC: query 3 scores v2 at its own quantization cells (0.04) and v1
    // far away; self excluded
    val top = ProductQuantization.adcTopK(
      vecs8.filter(col("vec_id") === 3L), enc, "vec_id", "embedding",
      codebooks, 2, k = 2)
      .select("vec_id", "rk", "neighbor_id")
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    top.map(_._3).toSeq shouldBe Seq(2L, 1L)
    // NON-DENSE centroid ids (codebooks keyed by source vector ids, the
    // q_x25 shape): ADC must remap codes to LUT slots, not index by id
    val sparseBooks = codebooks
      .withColumn("centroid_id", col("centroid_id") * 40)
    val encSparse = ProductQuantization.encode(vecs8, "vec_id", "embedding",
      sparseBooks, 2)
    val topSparse = ProductQuantization.adcTopK(
      vecs8.filter(col("vec_id") === 3L), encSparse, "vec_id", "embedding",
      sparseBooks, 2, k = 2)
      .select("rk", "neighbor_id").as[(Long, Long)].collect().sortBy(_._1)
    topSparse.map(_._2).toSeq shouldBe Seq(2L, 1L)
    // trained codebooks cover every subspace with k rows each and feed
    // encode directly
    val trained = ProductQuantization.trainCodebooks(vecs8, "vec_id",
      "embedding", m = 2, k = 2, iters = 2, dim = 8)
    trained.groupBy("subspace").count()
      .as[(Int, Long)].collect().toMap shouldBe Map(0 -> 2L, 1 -> 2L)
    ProductQuantization.encode(vecs8, "vec_id", "embedding", trained, 2)
      .count() shouldBe 3L
  }

  it should "compose IVF buckets with ADC scoring and restrict search to probed buckets" in {
    import graft.ann.ProductQuantization
    val codebooks = Seq(
      (0, 0L, Seq(0.0, 0.0, 0.0, 0.0)), (0, 1L, Seq(1.0, 1.0, 1.0, 1.0)),
      (1, 0L, Seq(0.0, 0.0, 0.0, 0.0)), (1, 1L, Seq(2.0, 2.0, 2.0, 2.0)))
      .toDF("subspace", "centroid_id", "centroid")
    val vecs8 = Seq(
      (1L, Array(0.0, 0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 2.0)),
      (2L, Array(1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0)),
      (3L, Array(0.9, 0.9, 0.9, 0.9, 0.0, 0.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val cents = vecs8.filter(col("vec_id").isin(1, 2))
    val encoded = ProductQuantization.ivfEncode(vecs8, "vec_id", "embedding",
      cents, codebooks, m = 2, dim = 8)
    // probe-0 buckets: v1 → c1; v2, v3 → c2 (cosine-parallel); codes as
    // in the flat-encode spec
    encoded.select("vec_id", "centroid_id").as[(Long, Long)]
      .collect().toMap shouldBe Map(1L -> 1L, 2L -> 2L, 3L -> 2L)
    val q3 = vecs8.filter(col("vec_id") === 3L)
    // single probe: only bucket c2 is searched — v1 is INVISIBLE even
    // with k=2 (the bucket restriction is the operator's point)
    val single = ProductQuantization.ivfAdcTopK(q3, encoded, "vec_id",
      "embedding", cents, codebooks, m = 2, k = 2, probes = 1)
      .select("rk", "neighbor_id").as[(Long, Long)].collect()
    single.toSeq shouldBe Seq((1L, 2L))
    // two probes: both buckets searched; ADC ranks v2 (shared codes,
    // dist 0.04) before v1
    val multi = ProductQuantization.ivfAdcTopK(q3, encoded, "vec_id",
      "embedding", cents, codebooks, m = 2, k = 2, probes = 2)
      .select("rk", "neighbor_id").as[(Long, Long)].collect().sortBy(_._1)
    multi.map(_._2).toSeq shouldBe Seq(2L, 1L)
  }

  it should "answer identically through the streamed-index brute-force form" in {
    // random corpus: the streamed form (query batch broadcast, corpus
    // streamed) must equal the broadcast-index form row for row
    val rnd = new scala.util.Random(13)
    // ZERO-NORM vectors at BOTH ends of the id order: their cosines are
    // NaN, which both forms must DROP (the shared contract). Id 0 is
    // the hard case — it reaches the broadcast form's insertion while
    // the top-k is still empty, where an un-guarded insertion would
    // park NaN in a slot no later candidate can displace; id 81 covers
    // the full-heap path; and partition placement must not matter for
    // the streamed form's merge window.
    val corpus = ((0L, Array.fill(6)(0.0)) +: (1L to 80L)
      .map(i => (i, Array.fill(6)(rnd.nextDouble() * 2 - 1))) :+
      (81L, Array.fill(6)(0.0)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") % 7 === 0)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val broadcastIdx = rows(Similarity.bruteForceTopK(queries, corpus,
      "vec_id", "embedding", 4, 6))
    val streamedIdx = rows(Similarity.bruteForceTopKStreamed(queries,
      corpus, "vec_id", "embedding", 4, 6))
    streamedIdx shouldBe broadcastIdx
    broadcastIdx should not be empty
    // the zero-norm vectors are never ranked as neighbors, and the
    // zero-norm QUERY (id 0 is in the query set) emits no rows at all
    broadcastIdx.filter(_.contains("[0,")) shouldBe empty
    all(broadcastIdx) should not include ",81,"
  }

  it should "answer identically through the distributed-query IVFADC form" in {
    import graft.ann.ProductQuantization
    // randomized corpus: the cogrouped form must equal the broadcast form
    // row for row, in both raw and residual encodings
    val rnd = new scala.util.Random(11)
    val vecs = (1L to 60L)
      .map(i => (i, Array.fill(8)(rnd.nextDouble() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val cents = vecs.filter(col("vec_id") % 9 === 0)
    val books = (0 until 2).map(s => cents.select(
        lit(s).as("subspace"), col("vec_id").as("centroid_id"),
        slice(col("embedding"), s * 4 + 1, 4).as("centroid")))
      .reduce(_ unionByName _)
    val queries = vecs.filter(col("vec_id") % 3 === 0)
    for (res <- Seq(false, true)) {
      val enc = ProductQuantization.ivfEncode(vecs, "vec_id", "embedding",
        cents, books, m = 2, dim = 8, residual = res)
      def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.collect().map(_.toString).sorted.toSeq
      val broadcastForm = rows(ProductQuantization.ivfAdcTopK(queries, enc,
        "vec_id", "embedding", cents, books, m = 2, k = 3, probes = 2,
        residual = res))
      val distributedForm = rows(ProductQuantization.ivfAdcTopKDistributed(
        queries, enc, "vec_id", "embedding", cents, books, m = 2, k = 3,
        dim = 8, probes = 2, residual = res))
      distributedForm shouldBe broadcastForm
      broadcastForm should not be empty
    }
  }

  it should "fail loud on codebook-mismatched or ragged ADC codes" in {
    import graft.ann.ProductQuantization
    val codebooks = Seq(
      (0, 0L, Seq(0.0, 0.0, 0.0, 0.0)), (0, 1L, Seq(1.0, 1.0, 1.0, 1.0)),
      (1, 0L, Seq(0.0, 0.0, 0.0, 0.0)), (1, 1L, Seq(2.0, 2.0, 2.0, 2.0)))
      .toDF("subspace", "centroid_id", "centroid")
    val vecs8 = Seq(
      (1L, Array(0.0, 0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 2.0)),
      (2L, Array(1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
      .mkString("\n")
    // codes encoded against a DIFFERENT codebook (shifted ids): the slot
    // lookup must name the mismatch, not throw a bare NoSuchElement
    val foreign = ProductQuantization.encode(vecs8, "vec_id", "embedding",
      codebooks.withColumn("centroid_id", col("centroid_id") + 7), 2)
    val exF = intercept[Exception] {
      ProductQuantization.adcTopK(vecs8.limit(1), foreign, "vec_id",
        "embedding", codebooks, 2, k = 1).collect()
    }
    chain(exF) should include("different codebook")
    // ragged codes (fewer than m): must name the expected arity
    val ragged = Seq((5L, Seq(0L))).toDF("vec_id", "codes")
    val exR = intercept[Exception] {
      ProductQuantization.adcTopK(vecs8.limit(1), ragged, "vec_id",
        "embedding", codebooks, 2, k = 1).collect()
    }
    chain(exR) should include("expected 2")
  }

  it should "normalize to unit vectors and quantize within one scale step" in {
    import graft.ann.Embeddings
    val df = Seq((1L, Seq(3.0, 4.0)), (2L, Seq(0.0, 0.0))).toDF("vec_id", "embedding")
    val n = df.select(col("vec_id"),
        Embeddings.normalized(col("embedding")).as("u"))
      .as[(Long, Seq[Double])].collect().toMap
    n(1L) shouldBe Seq(0.6, 0.8)
    n(2L) shouldBe Seq(0.0, 0.0) // zero vector passes through
    val q = Embeddings.quantizeInt8(df, "vec_id", "embedding")
      .select("vec_id", "scale", "q", "max_abs_err")
      .as[(Long, Double, Seq[Int], Double)].collect()
      .map(r => r._1 -> r).toMap
    q(1L)._3.max shouldBe 127 // the largest component maps to full range
    q(1L)._4 should be <= q(1L)._2 / 2 + 1e-12 // error bounded by scale/2
    q(2L)._3 shouldBe Seq(0, 0)
    q(2L)._4 shouldBe 0.0
  }

  it should "rank exact Euclidean neighbors and evaluate graft_l2 natively" in {
    graft.functions.L2DistanceExpr.register(spark)
    // nearest by L2 differs from nearest by cosine for unnormalized
    // vectors: (10,0,0) is cosine-identical to (1,0,0) but L2-far
    val pts = Seq(
      (1L, Array(0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(10.0f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 2.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.bruteForceTopKL2(pts, pts, "vec_id", "embedding", 2, 3)
      .select("vec_id", "rk", "neighbor_id", "distance")
      .as[(Long, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    r((1L, 1L)) shouldBe ((2L, 1.0))   // zero vector ranks fine under L2
    r((1L, 2L)) shouldBe ((4L, 2.0))
    r((2L, 1L)) shouldBe ((1L, 1.0))   // NOT 3: cosine twin is L2-far
    r((3L, 1L)) shouldBe ((2L, 9.0))
    // native expression: direct sqrt(Σ(a-b)²), ragged truncation, NULLs
    spark.sql("SELECT graft_l2(array(1.0d, 2.0d), array(4.0d, 6.0d)) AS d")
      .as[Double].head() shouldBe 5.0
    spark.sql("SELECT graft_l2(array(3.0d, 9.0d), array(7.0d)) AS d")
      .as[Double].head() shouldBe 4.0
    spark.sql("SELECT graft_l2(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d")
      .select(col("d").isNull).as[Boolean].head() shouldBe true
    // square-sum overflow on finite-but-huge inputs: the infinite
    // distance passes through (rounding would throw), still ranked
    val huge = Seq(
      (1L, Array(1e200, 0.0)), (2L, Array(-1e200, 0.0)))
      .toDF("vec_id", "embedding")
    val hr = Similarity.bruteForceTopKL2(huge, huge, "vec_id",
        "embedding", 1, 2)
      .select("vec_id", "neighbor_id", "distance")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    hr.map(_._2) shouldBe Seq(2L, 1L)
    hr.foreach(_._3.isPosInfinity shouldBe true)
  }

  it should "assign and search IVF buckets under the L2 metric" in {
    // (6,0,0) is cosine-identical to centroid (1,0,0) but L2-nearer to
    // centroid (8,0,0): the two metrics MUST disagree here
    val pts = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(8.0f, 0.0f, 0.0f)),
      (3L, Array(6.0f, 0.0f, 0.0f)),
      (4L, Array(1.2f, 0.1f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cents = pts.filter(col("vec_id").isin(1, 2))
    val l2 = Similarity.ivfAssignL2(pts, "vec_id", "embedding", cents, 3)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    l2 shouldBe Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L)
    val cos = Similarity.ivfAssign(pts, "vec_id", "embedding", cents, 3)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    cos(3L) shouldBe 1L // cosine puts 3 with centroid 1 — metrics differ
    // search stays in the bucket, ranked by distance asc
    val r = Similarity.ivfTopKL2(pts, "vec_id", "embedding", cents, 2, 3)
      .select("vec_id", "rk", "neighbor_id", "distance")
      .as[(Long, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    r((3L, 1L)) shouldBe ((2L, 2.0))
    r((1L, 1L))._1 shouldBe 4L // bucket-mate, not the L2-nearer 3
    r.keySet.map(_._1) shouldBe Set(1L, 2L, 3L, 4L)
  }

  it should "prune semantic duplicates greedily by id within clusters" in {
    graft.functions.DotProductExpr.register(spark)
    // cluster A (centroid 1): 1, 2≈1, 5≈1; cluster B (centroid 3): 3, 4
    // (4 is near 3 but below τ=0.999); 6 is zero-norm (NaN cosine) and
    // lands wherever argmax's NaN ranking puts it — it must be KEPT and
    // must not erase its cluster-mates.
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.001f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.9f, 0.1f)),
      (5L, Array(1.0f, 0.0f, 0.001f)),
      (6L, Array(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cents = corpus.filter(col("vec_id").isin(1, 3))
    val r = Similarity.semDeDup(corpus, "vec_id", "embedding", cents,
        0.999, 3)
      .select("vec_id", "dup_of", "keep")
      .as[(Long, Option[Long], Boolean)].collect()
      .map(x => x._1 -> x).toMap
    r(1L)._3 shouldBe true
    r(2L) shouldBe (2L, Some(1L), false) // earliest similar wins
    r(5L) shouldBe (5L, Some(1L), false) // min id, not min cosine
    r(3L)._3 shouldBe true
    r(4L)._3 shouldBe true // below threshold — kept
    r(6L) shouldBe (6L, None, true) // NaN is never duplicate evidence
    // invariant: no two KEPT cluster-mates at cosine >= τ
    val kept = Similarity.semDeDup(corpus, "vec_id", "embedding", cents,
        0.999, 3)
      .filter(col("keep"))
    val asg = Similarity.ivfAssign(corpus, "vec_id", "embedding", cents, 3)
    val viol = asg.join(kept.select("vec_id"), "vec_id")
      .select(col("centroid_id"), col("vec_id"), col("v"), col("nrm"))
      .as[(Long, Long, Array[Double], Double)].collect()
      .toSeq.groupBy(_._1).values.flatMap { g =>
        for {
          a <- g; b <- g if a._2 < b._2
          cos = a._3.zip(b._3).map(p => p._1 * p._2).sum / (a._4 * b._4)
          if !cos.isNaN && cos >= 0.999
        } yield (a._2, b._2)
      }
    viol shouldBe empty
  }

  it should "mine semi-hard triplets and skip anchors without positives (X82)" in {
    // anchor 100 (label A): positive 1 (A, cos ~1); candidate 2 (B) is
    // MORE similar than the positive -> excluded (too hard); 3 (B) is
    // semi-hard; anchor 200 (label C) has no same-label candidate -> no
    // rows at all.
    val qs = Seq(
      (100L, Array(1.0, 0.0, 0.0), "A"),
      (200L, Array(0.0, 1.0, 0.0), "C"))
      .toDF("vec_id", "embedding", "label")
    val cands = Seq(
      (1L, Array(1.0, 0.1, 0.0), "A"),
      (2L, Array(1.0, 0.05, 0.0), "B"),  // harder than the positive
      (3L, Array(0.7, 0.7, 0.0), "B"),
      (4L, Array(0.0, 0.9, 0.4), "B"))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.tripletMine(qs, cands, "vec_id", "embedding",
        "label", topN = 10, mNeg = 2, dim = 3)
      .orderBy("vec_id", "role", "rank")
      .select("vec_id", "role", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    out shouldBe Array(
      (100L, "neg", 1L, 3L),
      (100L, "neg", 2L, 4L),
      (100L, "pos", 1L, 1L))
    graft.util.Caches.releaseAll(spark)
  }

  it should "demote redundant near-duplicates in MMR re-ranking (X80)" in {
    // query q: candidates a (rel ~1), a2 (a near-dup of a, rel ~1), and
    // b (orthogonal-ish, lower rel). Plain top-2 = {a, a2}; MMR must
    // pick {a, b}: a2's redundancy penalty sinks it below b.
    val qs = Seq((100L, Array(1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val cands = Seq(
      (1L, Array(1.0, 0.01, 0.0)),   // a
      (2L, Array(2.0, 0.02, 0.0)),   // a2 = 2·a: exact duplicate, cos 1
      (3L, Array(0.1, 0.995, 0.0)))  // b: low rel but diverse
      .toDF("vec_id", "embedding")
    val out = Similarity.mmrTopK(qs, cands, "vec_id", "embedding",
        k = 3, topN = 3, lambdaRel = 0.3, dim = 3)
      .orderBy("rank")
      .select("rank", "neighbor_id", "mmr_score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out.map(_._2) shouldBe Array(1L, 3L, 2L)
    // rank-1 score is λ·rel with no penalty
    out(0)._3 shouldBe 0.3 * (1.0 / math.sqrt(1.0 + 0.01 * 0.01)) +- 1e-6
    // the exact duplicate's final score carries the full cos=1 penalty
    out(2)._3 shouldBe 0.3 * (1.0 / math.sqrt(1.0 + 0.01 * 0.01)) -
      0.7 +- 1e-6
    graft.util.Caches.releaseAll(spark)
  }

  it should "mean-pool chunk embeddings with ragged-position honesty (X79)" in {
    val df = Seq(
      (1L, Array(1.0, 3.0)),
      (1L, Array(3.0, 5.0)),
      (2L, Array(2.0, 4.0, 6.0)),
      (2L, Array(4.0)) // ragged: contributes only to pos 0
    ).toDF("grp", "v")
    val out = graft.ann.Embeddings.meanPool(df, "grp", "v")
      .orderBy("group_id")
      .collect()
    out(0).getLong(1) shouldBe 2L
    out(0).getSeq[Double](2) shouldBe Seq(2.0, 4.0)
    out(0).getDouble(3) shouldBe math.sqrt(20.0) +- 1e-6
    out(1).getLong(1) shouldBe 2L
    out(1).getSeq[Double](2) shouldBe Seq(3.0, 4.0, 6.0)
  }

  it should "build an IVF index incrementally and query it equivalently (X76)" in {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val cents = emb.filter(col("vec_id") % 40 === 0)
    val corpus = emb.filter(col("vec_id") % 4 =!= 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_spec").toString + "/idx"
    // two-batch append vs one-shot: row-identical index contents
    Similarity.writeIvfIndex(Similarity.buildIvfIndex(
      emb.filter(col("vec_id") % 4 === 1 || col("vec_id") % 4 === 2),
      "vec_id", "embedding", cents, 64), path, mode = "overwrite")
    Similarity.writeIvfIndex(Similarity.buildIvfIndex(
      emb.filter(col("vec_id") % 4 === 3),
      "vec_id", "embedding", cents, 64), path)
    val oneShot = Similarity.buildIvfIndex(corpus, "vec_id", "embedding",
      cents, 64)
    val readBack = spark.read.parquet(path)
    readBack.select(col("vec_id"), col("centroid_id").cast("long"))
      .exceptAll(oneShot.select(col("vec_id"), col("centroid_id")))
      .count() shouldBe 0L
    oneShot.count() shouldBe readBack.count()
    // parquet round-trip changes nothing about the query answer
    val queries = emb.filter(col("vec_id") % 4 === 0)
    val fromDisk = Similarity.ivfTopKFromIndex(readBack, queries,
      "vec_id", "embedding", cents, 3, 64).collect().toSet
    val fromMem = Similarity.ivfTopKFromIndex(oneShot, queries,
      "vec_id", "embedding", cents, 3, 64).collect().toSet
    fromDisk shouldBe fromMem
    fromDisk should not be empty
    // the partitioned layout exposes centroid_id partition filters to
    // the scan: a single-bucket read prunes to that bucket's files
    val someBucket = readBack.select("centroid_id").head().getInt(0)
    val pruned = spark.read.parquet(path)
      .filter(col("centroid_id") === someBucket)
    pruned.queryExecution.executedPlan.toString should include(
      "PartitionFilters: [isnotnull(centroid_id")
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Embeddings.dimAblation (X95)"

  it should "expose cosine loss hidden in truncated dimensions" in {
    import spark.implicits._
    // prefix-identical, suffix-opposed: cos = 1 at 2 dims, 0 at 4
    val df = Seq(
      (1L, Seq(1.0, 0.0, 1.0, 0.0)),
      (2L, Seq(1.0, 0.0, -1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val got = graft.ann.Embeddings.dimAblation(df, "vec_id", "embedding",
        dims = Seq(2, 4), stride = 1L)
      .as[(Int, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    got(2) shouldBe ((1L, 1.0, 1.0)) // cos 1 but off the full cos by 1
    got(4) shouldBe ((1L, 0.0, 0.0)) // full dim: faithful by definition
    graft.util.Caches.releaseAll(spark)
  }

  it should "drop NaN prefixes pairwise, keeping valid dims" in {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.0, 0.0, 1.0)), (2L, Seq(0.0, 0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val got = graft.ann.Embeddings.dimAblation(df, "vec_id", "embedding",
        dims = Seq(2, 3), stride = 1L)
      .as[(Int, Long, Double, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    got.get(2) shouldBe None // zero-norm prefix: the pair drops
    got(3) shouldBe 1L
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Embeddings.cosineHistogram (X104)"

  it should "bin known cosines on fixed edges with explicit zero bins" in {
    import spark.implicits._
    // stride-1 pairs: (1,2) cos=1 -> clamped top bucket 19;
    // (2,3) cos=0 -> bucket 10; (3,4) involves a zero vector -> dropped
    val df = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)),
      (3L, Seq(0.0, 1.0)), (4L, Seq(0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val rows = graft.ann.Embeddings.cosineHistogram(df, "vec_id",
        "embedding", stride = 1L)
      .select(col("bucket"), col("lo"), col("hi"), col("n"))
      .as[(Long, Double, Double, Long)].collect().sortBy(_._1)
    rows.length shouldBe 20 // full grid, empty bins as zero rows
    rows.map(_._4).sum shouldBe 2L
    val byBucket = rows.map(r => r._1 -> r._4).toMap
    byBucket(19L) shouldBe 1L // cos = 1 clamps into the last bin
    byBucket(10L) shouldBe 1L // cos = 0
    rows.head._2 shouldBe -1.0
    rows.last._3 shouldBe 1.0
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Similarity.embeddingDrift"

  it should "score identical centroids 1/0 and orthogonal drift 0" in {
    import spark.implicits._
    // periods 0 and 1 share the e1-axis centroid (period 1's spread
    // cancels pairwise); period 2 sits on e2 — orthogonal
    val df = Seq(
      (0, Array(1.0, 0.0)), (0, Array(1.0, 0.0)),
      (1, Array(2.0, 0.5)), (1, Array(0.0, -0.5)),
      (2, Array(0.0, 3.0)), (2, Array(0.0, 1.0)))
      .toDF("p", "v")
    val r = graft.ann.Similarity.embeddingDrift(df, col("p"), col("v"))
      .orderBy(col("period_a"), col("period_b"))
      .select("period_a", "period_b", "n_a", "n_b", "cosine", "l2")
      .as[(Int, Int, Long, Long, Double, Double)].collect()
    // (0,1): both centroids (1, 0) -> cosine 1, l2 0
    r(0) shouldBe ((0, 1, 2L, 2L, 1.0, 0.0))
    // (0,2): (1,0) vs (0,2) -> cosine 0, l2 sqrt(5)
    r(1)._5 shouldBe 0.0
    r(1)._6 shouldBe math.floor(math.sqrt(5.0) * 1e6 + 0.5) / 1e6
    r(2)._5 shouldBe 0.0 // (1,2) same
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Similarity.embeddingDimDrift (X180)"

  it should "localize a planted one-dimension shift with hand WITHIN-group moments" in {
    // the sd is the WITHIN-snapshot pooled sigma (Cohen's-d style) —
    // a mixture sd would include the shift itself and cap z at 2 for
    // equal halves. dim 0: each side constant (within-sd 0) -> the
    // mean moved but there is no within-spread scale -> NULL shift;
    // dim 1: identical sides (0,2): within-sd 1, diff 0 -> z = 0
    val ref = Seq(Seq(0f, 0f), Seq(0f, 2f)).toDF("embedding")
    val cur = Seq(Seq(1f, 0f), Seq(1f, 2f)).toDF("embedding")
    val r = graft.ann.Similarity
      .embeddingDimDrift(ref, cur, "embedding", 2)
      .as[(Long, Long, Long, Double, Double, Double, Double,
        Option[Double])].collect()
    r(0) shouldBe ((0L, 2L, 2L, 0.0, 1.0, 1.0, 0.0, None))
    r(1) shouldBe ((1L, 2L, 2L, 1.0, 1.0, 0.0, 1.0, Some(0.0)))
    // a 3-within-sigma drift reads exactly 3 — the mixture formula
    // would have saturated it near 2
    val r3 = graft.ann.Similarity.embeddingDimDrift(
      Seq(Seq(0f), Seq(2f)).toDF("embedding"),
      Seq(Seq(3f), Seq(5f)).toDF("embedding"), "embedding", 1)
      .as[(Long, Long, Long, Double, Double, Double, Double,
        Option[Double])].collect().head
    r3 shouldBe ((0L, 2L, 2L, 1.0, 4.0, 3.0, 1.0, Some(3.0)))
    // a constant dimension has zero pooled sigma -> NULL std_shift
    val c = Seq(Seq(5f)).toDF("embedding")
    graft.ann.Similarity.embeddingDimDrift(c, c, "embedding", 1)
      .as[(Long, Long, Long, Double, Double, Double, Double,
        Option[Double])].collect().head._8 shouldBe None
  }

  it should "fail loud on ragged vectors and stay partition-invariant" in {
    val ok = Seq(Seq(1f, 2f)).toDF("embedding")
    val ragged = Seq(Seq(1f, 2f), Seq(3f)).toDF("embedding")
    an[Exception] should be thrownBy
      graft.ann.Similarity.embeddingDimDrift(ok, ragged, "embedding", 2)
        .collect()
    val a = (1 to 200).map(i =>
      Seq((i % 7).toFloat, (i % 5).toFloat, (i % 3).toFloat))
      .toDF("embedding")
    val b = (1 to 150).map(i =>
      Seq((i % 6).toFloat, (i % 4).toFloat, (i % 9).toFloat))
      .toDF("embedding")
    def run(x: org.apache.spark.sql.DataFrame,
        y: org.apache.spark.sql.DataFrame) =
      graft.ann.Similarity.embeddingDimDrift(x, y, "embedding", 3)
        .as[(Long, Long, Long, Double, Double, Double, Double,
          Option[Double])].collect().toSeq
    run(a.coalesce(1), b.coalesce(1)) shouldBe
      run(a.repartition(13), b.repartition(7))
  }

  it should "fail loud on an empty snapshot instead of reading 'no drift'" in {
    // the dim_idx inner join would turn a missing snapshot into a
    // silently empty result — the drift family's convention is raise
    val ok = Seq(Seq(1f, 2f)).toDF("embedding")
    val empty = Seq.empty[Seq[Float]].toDF("embedding")
    an[IllegalArgumentException] should be thrownBy
      graft.ann.Similarity.embeddingDimDrift(empty, ok, "embedding", 2)
    an[IllegalArgumentException] should be thrownBy
      graft.ann.Similarity.embeddingDimDrift(ok, empty, "embedding", 2)
  }
}
