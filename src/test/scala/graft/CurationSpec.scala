package graft

import graft.curate.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  behavior of "stratifiedSample"

  it should "be deterministic, respect fractions, and drop unlisted strata" in {
    val df = (1 to 2000).map(i => (i.toLong, if (i % 2 == 0) "en" else "xx"))
      .toDF("id", "lang")
    val kept = Curation.stratifiedSample(df, "id", "lang",
      Map("en" -> 0.5), "seed1")
    // unlisted stratum fully dropped
    kept.filter(col("lang") === "xx").count() shouldBe 0
    // ~50% of the 1000 'en' rows survive (hash-uniform, loose bound)
    val n = kept.count()
    n should (be > 400L and be < 600L)
    // same seed → identical set; different seed → different set
    val again = Curation.stratifiedSample(df, "id", "lang",
      Map("en" -> 0.5), "seed1").select("id").as[Long].collect().sorted
    again shouldBe kept.select("id").as[Long].collect().sorted
    val other = Curation.stratifiedSample(df, "id", "lang",
      Map("en" -> 0.5), "seed2").select("id").as[Long].collect().sorted
    other should not equal again
  }

  behavior of "epochPlan"

  it should "cap the scarce domain at maxEpochs and place the rest by weight" in {
    // tokens: rare 100, big 900 (one doc per token-count via word repeat)
    def doc(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val df = Seq(("rare", doc(100)), ("big", doc(900)))
      .toDF("domain", "text")
    // α=0.5: wraw = (.1^.5, .9^.5) = (.3162, .9487); w = (.25, .75)
    // B = 500, cap = 2·tokens: rare wants .25·500=125 > 200? no —
    // use maxEpochs=1: cap_rare=100 < 125 → capped; λ=(500-100)/.75
    val out = Curation.epochPlan(df, "text", "domain",
      budgetTokens = 500, maxEpochs = 1.0, alpha = 0.5)
      .orderBy("domain").collect()
    val big = out(0); val rare = out(1)
    rare.getString(0) shouldBe "rare"
    rare.getBoolean(6) shouldBe true
    rare.getDouble(4) shouldBe 100.0 +- 1e-6 // pinned at capacity
    rare.getDouble(5) shouldBe 1.0 +- 1e-9   // = maxEpochs
    big.getBoolean(6) shouldBe false
    // λ·w_big = (500-100)/w_big·w_big = 400
    big.getDouble(4) shouldBe 400.0 +- 1e-6
    // allocations exhaust the budget exactly
    out.map(_.getDouble(4)).sum shouldBe 500.0 +- 1e-6
  }

  it should "produce identical plans on the driver fast path and the distributed fallback" in {
    // the wave-34 fix: k ≤ driverMaxDomains runs the water-filling as
    // plain Scala (the plan is broadcast downstream, so k is driver-
    // sized by construction); the two-phase distributed form stays the
    // fallback. Same IEEE trees — the plans must match bit-for-bit on
    // capped, uncapped and mixed boards, including the skewed shape
    // q_x62 exercises.
    for ((sizes, budget, maxE, a) <- Seq(
      (Seq(("rare", 100L), ("big", 900L)), 500L, 1.0, 0.5),
      (Seq(("a", 50L), ("b", 150L)), 10000L, 3.0, 0.5),
      (Seq(("a", 400L), ("b", 600L)), 100L, 5.0, 1.0),
      (Seq(("common", 93137L), ("mid", 21071L), ("rare", 2471L)),
        58339L, 2.0, 0.5),
      ((1 to 40).map(i => (s"d$i", (i * i * 7 + 3).toLong)), 9000L,
        2.5, 0.7))) {
      val df = sizes.toDF("domain", "tokens_available")
      def run(driverMax: Int) =
        Curation.epochPlanFromSizes(df, budget, maxE, a,
          driverMaxDomains = driverMax)
          .orderBy("domain")
          .as[(String, Long, Double, Double, Double, Double, Boolean)]
          .collect().toSeq
      run(1000000) shouldBe run(0)
      graft.util.Caches.releaseAll(spark)
    }
  }

  it should "allocate full capacity when the budget exceeds it" in {
    def doc(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val df = Seq(("a", doc(50)), ("b", doc(150))).toDF("domain", "text")
    val out = Curation.epochPlan(df, "text", "domain",
      budgetTokens = 10000, maxEpochs = 3.0, alpha = 0.5)
      .orderBy("domain").collect()
    out.map(_.getBoolean(6)).toSeq shouldBe Seq(true, true)
    out.map(_.getDouble(4)).toSeq shouldBe Seq(150.0, 450.0)
    out.map(_.getDouble(5)).toSeq shouldBe Seq(3.0, 3.0)
  }

  it should "reduce to pure temperature weighting when no cap binds" in {
    def doc(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val df = Seq(("a", doc(400)), ("b", doc(600))).toDF("domain", "text")
    val out = Curation.epochPlan(df, "text", "domain",
      budgetTokens = 100, maxEpochs = 5.0, alpha = 1.0)
      .orderBy("domain").collect()
    out.map(_.getBoolean(6)).toSeq shouldBe Seq(false, false)
    // α=1 keeps raw shares: 40/60 split of 100
    out(0).getDouble(4) shouldBe 40.0 +- 1e-6
    out(1).getDouble(4) shouldBe 60.0 +- 1e-6
  }

  behavior of "packSequences"

  it should "cut packs at the token budget with per-shard streams" in {
    val df = Seq((1L, 0L, 4L), (2L, 0L, 5L), (3L, 0L, 3L), (4L, 0L, 8L),
      (5L, 1L, 9L), (6L, 1L, 2L))
      .toDF("doc_id", "shard", "n_toks")
    val packed = Curation.packSequences(df, "n_toks", "shard", "doc_id", 10L)
      .select("doc_id", "pack_id", "pack_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // shard 0 stream offsets: 0,4,9,12 → packs 0,0,0,1 (doc 3 straddles)
    packed shouldBe Array(
      (1L, 0L, 0L), (2L, 0L, 4L), (3L, 0L, 9L), (4L, 1L, 2L),
      (5L, 0L, 0L), (6L, 0L, 9L))
  }

  it should "weight target-like docs above off-distribution docs (DSIR)" in {
    // target speaks vocabulary T; the raw pool mixes T-docs and docs
    // over a disjoint vocabulary U. A T-doc's hashed features live in
    // target-heavy buckets -> positive importance; U-docs negative.
    val tDocs = Seq(
      (101L, "spark shuffle partition broadcast join filter"),
      (102L, "partition join shuffle spark broadcast scan"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "spark shuffle partition broadcast join scan"), // target-like
      (2L, "zebra yak walrus vole tapir shrew"))           // off-dist
      .toDF("doc_id", "text")
    val out = Curation.dsirImportance(corpus, "doc_id", "text",
      tDocs, "text")
      .select("doc_id", "importance", "keep")
      .as[(Long, Option[Double], Boolean)].collect().sortBy(_._1).toSeq
    val Seq(a, b) = out
    a._2.get should be > b._2.get
    a._3 shouldBe true   // target-like: kept
    b._3 shouldBe false  // off-distribution: dropped
  }

  it should "flatten domain shares by temperature and conserve the epoch" in {
    // 9:1 token split: web docs carry 9 tokens, books 1. At α = 0.5 the
    // shares 0.9/0.1 flatten to 0.75/0.25, so the epoch factors are
    // 0.75/0.9 = 0.8333 and 0.25/0.1 = 2.5.
    val corpus = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9", "web"),
      (2L, "b1", "books"))
      .toDF("doc_id", "text", "source")
    val r = Curation.temperatureMixture(corpus, "doc_id", "text",
        "source", 0.5, "s")
      .select("doc_id", "n_tokens", "mix_factor", "n_copies")
      .as[(Long, Long, Double, Long)].collect()
      .map(t => t._1 -> t).toMap
    r(1L)._2 shouldBe 9L
    r(1L)._3 shouldBe 0.833333
    r(2L)._3 shouldBe 2.5
    // factors conserve the epoch: Σ f_d · s_d = 1
    (r(1L)._3 * 0.9 + r(2L)._3 * 0.1) shouldBe (1.0 +- 1e-5)
    // copies = floor(f) + Bernoulli(frac(f)): 2.5 → 2 or 3, 0.83 → 0 or 1
    r(2L)._4 should (be(2L) or be(3L))
    r(1L)._4 should (be(0L) or be(1L))
    // α = 1 is the identity mix: every factor 1, every doc exactly once
    val id = Curation.temperatureMixture(corpus, "doc_id", "text",
        "source", 1.0, "s")
      .select("mix_factor", "n_copies")
      .as[(Double, Long)].collect()
    id.foreach { case (f, c) => f shouldBe 1.0; c shouldBe 1L }
    // a zero-token domain (empty/null texts) gets factor 0 and no
    // copies instead of a 0/0 division error; others are untouched
    val withEmpty = corpus.unionByName(
      Seq((3L, null.asInstanceOf[String], "spam")).toDF("doc_id", "text", "source"))
    val z = Curation.temperatureMixture(withEmpty, "doc_id", "text",
        "source", 0.5, "s")
      .select("doc_id", "mix_factor", "n_copies")
      .as[(Long, Double, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    z(3L) shouldBe ((0.0, 0L))
    z(1L)._1 shouldBe 0.833333 // null text -> 0 tokens -> shares unchanged
  }

  it should "export shards with stable placement and hash-uniform balance" in {
    val docs = (1L to 400L).map(i => (i, s"tok$i word common")).toDF("doc_id", "text")
    val full = s"${System.getProperty("java.io.tmpdir")}/graft_shard_spec_full"
    val half = s"${System.getProperty("java.io.tmpdir")}/graft_shard_spec_half"
    val manifest = Curation.shardedExport(docs, "doc_id", "text", 8, full)
      .collect()
    manifest.map(_.getLong(1)).sum shouldBe 400L
    // hash-uniform: 400/8 = 50 per shard, Poisson σ ≈ 7 — loose 4σ walls
    manifest.map(_.getLong(1)).min should be > 20L
    manifest.map(_.getLong(1)).max should be < 90L
    // stability: a doc's shard is a pure function of (seed, id) — the
    // half-corpus export must place every common doc identically
    Curation.shardedExport(docs.filter(col("doc_id") <= 200), "doc_id",
      "text", 8, half).collect()
    val fullAsg = spark.read.parquet(full)
      .select(col("doc_id"), col("shard").cast("long"))
      .as[(Long, Long)].collect().toMap
    val halfAsg = spark.read.parquet(half)
      .select(col("doc_id"), col("shard").cast("long"))
      .as[(Long, Long)].collect().toMap
    halfAsg.foreach { case (id, s) => fullAsg(id) shouldBe s }
    halfAsg.size shouldBe 200
  }

  behavior of "carveTopK"

  it should "keep exactly min(k, stratum size) rows per stratum" in {
    val docs = ((1L to 100L).map(i => (i, "big")) ++
      (101L to 103L).map(i => (i, "small")))
      .toDF("doc_id", "stratum")
    val out = Curation.carveTopK(docs, "doc_id", "stratum", 10, "ev")
    val sizes = out.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    sizes("big") shouldBe 10L
    sizes("small") shouldBe 3L
    // ranks are 1..k dense per stratum
    out.filter(col("stratum") === "big").select("sample_rank")
      .as[Long].collect().sorted.toSeq shouldBe (1L to 10L)
  }

  it should "survive hash-order pre-thinning unchanged and ignore partitioning" in {
    val docs = (1L to 400L).map(i => (i, "s")).toDF("doc_id", "stratum")
    val direct = Curation.carveTopK(docs, "doc_id", "stratum", 15, "ev")
      .select("doc_id").as[Long].collect().sorted.toSeq
    // pre-thin at a rate that keeps >= k rows: same hash order, so the
    // lowest-k prefix is identical
    val thinned = Curation.stratifiedSample(docs, "doc_id", "stratum",
      Map("s" -> 0.25), "ev")
    thinned.count() should be >= 15L
    val composed = Curation.carveTopK(thinned, "doc_id", "stratum", 15, "ev")
      .select("doc_id").as[Long].collect().sorted.toSeq
    composed shouldBe direct
    val repart = Curation.carveTopK(docs.repartition(7), "doc_id",
      "stratum", 15, "ev")
      .select("doc_id").as[Long].collect().sorted.toSeq
    repart shouldBe direct
  }

  behavior of "materializePlan"

  /** Driver-side mirror of the op's md5 Bernoulli, for exact-expectation
    * checks. */
  private def expectedCopies(id: Long, seed: Long, epochs: Double): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"ep|$seed|$id".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex, 16)
    val frac = epochs - math.floor(epochs)
    math.floor(epochs).toLong +
      (if (h < math.floor(frac * 4294967296.0).toLong) 1L else 0L)
  }

  it should "emit exactly floor(e) copies for whole-number epochs" in {
    val docs = (1L to 30L).map(i => (i, "alpha beta gamma", "d"))
      .toDF("doc_id", "text", "domain")
    val plan = Seq(("d", 2.0)).toDF("domain", "epochs")
    val out = Curation.materializePlan(docs, "doc_id", "text",
      "domain", plan, seed = 7L)
    out.count() shouldBe 60L
    out.groupBy("doc_id").count().select("count").distinct()
      .as[Long].collect().toSeq shouldBe Seq(2L)
  }

  it should "place fractional-epoch copies exactly per the md5 draw" in {
    val docs = (1L to 200L).map(i => (i, ("tok " * 5).trim, "d"))
      .toDF("doc_id", "text", "domain")
    val plan = Seq(("d", 1.3)).toDF("domain", "epochs")
    val got = Curation.materializePlan(docs, "doc_id", "text",
      "domain", plan, seed = 7L)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    (1L to 200L).foreach { id =>
      got.getOrElse(id, 0L) shouldBe expectedCopies(id, 7L, 1.3)
    }
    // and the fractional draw actually splits the corpus both ways
    got.values.toSet shouldBe Set(1L, 2L)
  }

  it should "carry payload columns through to every copy" in {
    val docs = (1L to 20L).map(i => (i, s"text of $i", "d"))
      .toDF("doc_id", "text", "domain")
    val plan = Seq(("d", 2.0)).toDF("domain", "epochs")
    val out = Curation.materializePlan(docs, "doc_id", "text",
      "domain", plan, seed = 7L, carryCols = Seq("text"))
    out.columns should contain("text")
    out.count() shouldBe 40L
    // each copy carries ITS doc's text verbatim
    out.select(col("doc_id"), col("text")).distinct().count() shouldBe 20L
    out.filter(col("text") =!= concat(lit("text of "), col("doc_id")))
      .count() shouldBe 0L
    // composed with the sharded export: every copy lands in a shard and
    // the read-back manifest accounts for all of them
    val path = java.nio.file.Files
      .createTempDirectory("graft_plan_exp").toString
    val keyed = out.withColumn("copy_key",
      concat_ws("#", col("doc_id"), col("copy_idx")))
    val manifest = Curation.shardedExport(keyed, "copy_key", "text",
      nShards = 4, path).collect()
    manifest.map(_.getLong(1)).sum shouldBe 40L
  }

  it should "be partitioning-invariant and compose with epochPlan" in {
    val docs = (1L to 120L).map { i =>
      val dom = if (i % 10 == 0) "rare" else "common"
      (i, ("w " * (10 + (i % 7).toInt)).trim, dom)
    }.toDF("doc_id", "text", "domain")
    val plan = Curation.epochPlan(docs, "text", "domain",
      budgetTokens = 600L, maxEpochs = 3.0, alpha = 0.5)
    val a = Curation.materializePlan(docs, "doc_id", "text",
      "domain", plan, seed = 11L)
      .orderBy("doc_id", "copy_idx").collect().toSeq
    val b = Curation.materializePlan(docs.repartition(7), "doc_id",
      "text", "domain", plan, seed = 11L)
      .orderBy("doc_id", "copy_idx").collect().toSeq
    a shouldBe b
    // no domain exceeds its capacity ceiling of maxEpochs passes
    val perDom = a.groupBy(_.getString(0)).map { case (d, rows) =>
      d -> rows.map(_.getLong(3)).sum }
    val caps = plan.select("domain", "capacity")
      .as[(String, Double)].collect().toMap
    perDom.foreach { case (d, toks) =>
      toks.toDouble should be <= caps(d) + 40.0 // one doc of slack
    }
  }

  behavior of "Curation.qualityPrune (X81)"

  it should "keep exactly ceil(n/4) per domain with rational arithmetic" in {
    // domains of size 1..9: ceil(n/4) = 1,1,1,1,2,2,2,2,3
    val rows = for {
      d <- 1 to 9; i <- 1 to d
    } yield (d.toLong * 100 + i, s"dom$d", i.toLong)
    val df = rows.toDF("doc_id", "dom", "score")
    val out = Curation.qualityPrune(df, "doc_id", "dom", "score", 1, 4)
    val kept = out.filter(col("keep")).groupBy("domain").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    (1 to 9).foreach { d =>
      kept(s"dom$d") shouldBe ((d + 3) / 4).toLong
    }
    // the kept rows are the TOP scores, ties to lower id
    out.filter(col("domain") === "dom8" && col("keep"))
      .select("doc_id").as[Long].collect().sorted shouldBe
      Array(807L, 808L) // scores 7 and 8 of dom8
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Curation.contextManifest (X77)"

  it should "tile docs across fixed sequences with EOS gaps" in {
    // docs: 5, 3, 130 tokens; L=64, sep=1
    // offsets: d1 [0,5) sep 5; d2 [6,9) sep 9; d3 [10,140) sep 140
    val docs = Seq((1L, 5L), (2L, 3L), (3L, 130L)).toDF("doc_id", "n")
    val m = Curation.contextManifest(docs, "doc_id", "n", 64L, 1L)
      .orderBy("seq_id", "doc_id")
      .select("seq_id", "doc_id", "doc_start_tok", "seq_start_pos",
        "n_toks")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    m shouldBe Array(
      (0L, 1L, 0L, 0L, 5L),
      (0L, 2L, 0L, 6L, 3L),
      (0L, 3L, 0L, 10L, 54L),   // doc3 [10,64) of seq 0
      (1L, 3L, 54L, 0L, 64L),   // doc3 fills seq 1
      (2L, 3L, 118L, 0L, 12L))  // doc3 tail [128,140)
  }

  it should "reassemble every doc exactly and never cross a boundary" in {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        coalesce(org.apache.spark.sql.functions.size(
          graft.text.Dedup.words(col("text"))), lit(0)).cast("long")
          .as("n"))
    val m = Curation.contextManifest(docs, "doc_id", "n", 128L, 1L)
    // segments stay inside their sequence
    m.filter(col("seq_start_pos") + col("n_toks") > 128L)
      .count() shouldBe 0L
    m.filter(col("n_toks") <= 0L).count() shouldBe 0L
    // per-doc: segments contiguous from 0 and summing to the doc length
    val perDoc = m.groupBy("doc_id").agg(
      sum("n_toks").as("tot"), min("doc_start_tok").as("mn"),
      max(col("doc_start_tok") + col("n_toks")).as("mx"))
    perDoc.join(docs.filter(col("n") > 0), "doc_id")
      .filter(col("tot") =!= col("n") || col("mn") =!= 0L ||
        col("mx") =!= col("n"))
      .count() shouldBe 0L
    graft.util.Caches.releaseAll(spark)
  }

  it should "be invariant under input partitioning" in {
    val docs = (1L to 257L).map(i => (i, i % 7)).toDF("doc_id", "n")
    def run(parts: Int) = Curation.contextManifest(
      docs.repartition(parts), "doc_id", "n", 32L, 1L)
      .collect().map(r => r.toSeq).toSet
    run(1) shouldBe run(13)
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "leakageSafeSplit (X94)"

  it should "keep near-duplicate documents on the same side" in {
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    val docs = (Seq(
      (1L, base),
      (2L, base + " extra"), // near-dup of 1
      (3L, "completely different text about spark shuffles and " +
        "partitions and exchanges and codegen stages everywhere")) ++
      (10L to 49L).map(i => (i, s"unique filler document number $i " +
        s"with its own words token$i alpha$i beta$i gamma$i delta$i " +
        s"epsilon$i zeta$i eta$i theta$i")))
      .toDF("doc_id", "text")
    val s = Curation.leakageSafeSplit(docs, "doc_id", "text", 0.5, "t1")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    s(1L)._1 shouldBe s(2L)._1 // same near-dup group
    s(1L)._2 shouldBe s(2L)._2 // hence same split side
    s(3L)._1 shouldBe 3L // singleton groups as itself
    // both sides populated at fraction 0.5 over ~43 groups
    val sides = s.values.map(_._2).toSet
    sides shouldBe Set("train", "test")
    graft.util.Caches.releaseAll(spark)
  }

  it should "be invariant per group under corpus growth" in {
    val mk = (ids: Seq[Long]) => ids.map(i =>
      (i, s"solo doc $i words token$i alpha$i beta$i gamma$i delta$i " +
        s"epsilon$i zeta$i eta$i theta$i iota$i")).toDF("doc_id", "text")
    val small = Curation.leakageSafeSplit(mk(1L to 30L), "doc_id",
      "text", 0.3, "g1").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val grown = Curation.leakageSafeSplit(mk(1L to 60L), "doc_id",
      "text", 0.3, "g1").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    (1L to 30L).foreach { i => grown(i) shouldBe small(i) }
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "prioritySample"

  it should "return exactly k rows with contiguous ranks, deterministically" in {
    val df = (1L to 500L).map(i => (i, 1L + i % 17)).toDF("id", "w")
    val s1 = Curation.prioritySample(df, "id", "w", k = 50, "sd")
      .select(col("id"), col("sample_rank")).as[(Long, Long)]
      .collect().sortBy(_._2)
    s1.length shouldBe 50
    s1.map(_._2).toSeq shouldBe (1L to 50L)
    val s2 = Curation.prioritySample(df, "id", "w", k = 50, "sd")
      .select(col("id"), col("sample_rank")).as[(Long, Long)]
      .collect().sortBy(_._2)
    s2.toSeq shouldBe s1.toSeq
  }

  it should "be invariant under uniform weight scaling" in {
    // q = w/u: multiplying every weight by a constant rescales every
    // priority equally, so the sampled SET and order are unchanged
    val df = (1L to 300L).map(i => (i, 1L + i % 13)).toDF("id", "w")
    val a = Curation.prioritySample(df, "id", "w", 40, "sc")
      .select(col("id")).as[Long].collect().toSeq
    val b = Curation.prioritySample(
        df.withColumn("w", col("w") * 1000L), "id", "w", 40, "sc")
      .select(col("id")).as[Long].collect().toSeq
    b shouldBe a
  }

  it should "always keep a row whose weight dominates the u range" in {
    // max priority of a weight-1 row is 2^32/1; a weight-2^33 row's
    // MINIMUM priority is 2·2^32 — it can never lose
    val df = ((1L to 200L).map(i => (i, 1L)) :+ (999L, 8589934592L))
      .toDF("id", "w")
    Curation.prioritySample(df, "id", "w", 1, "dom")
      .select(col("id")).as[Long].collect().toSeq shouldBe Seq(999L)
  }

  "apportion (X109)" should "allocate exactly the budget by largest remainder with name-deterministic ties" in {
    import org.apache.spark.sql.functions.col
    // counts 5, 3, 2 over budget 7: quotas 3.5, 2.1, 1.4 ->
    // bases 3, 2, 1 (sum 6), one leftover -> largest remainder .5 wins
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("id", "dom")
    val r = Curation.apportion(df, "dom", budget = 7L)
      .select(col("domain"), col("base"), col("extra"), col("alloc"))
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    r("a") shouldBe (("a", 3L, 1L, 4L))
    r("b") shouldBe (("b", 2L, 0L, 2L))
    r("c") shouldBe (("c", 1L, 0L, 1L))
    r.values.map(_._4).sum shouldBe 7L
    // exact ties: equal counts -> equal remainders -> name order wins
    val tied = (Seq.fill(3)("x") ++ Seq.fill(3)("y")).zipWithIndex
      .map { case (d, i) => (i.toLong, d) }.toDF("id", "dom")
    val t2 = Curation.apportion(tied, "dom", budget = 3L)
      .select(col("domain"), col("alloc")).as[(String, Long)]
      .collect().toMap
    t2("x") shouldBe 2L // 1.5 quota each; x takes the leftover seat
    t2("y") shouldBe 1L
    t2.values.sum shouldBe 3L
    graft.util.Caches.releaseAll(spark)
  }

  it should "reduce to pure hash order under equal weights" in {
    // equal w: q = C/(x+1) is strictly decreasing in the hash x, so the
    // sample is the k smallest uniformHash values
    val df = (1L to 400L).map(i => (i, 7L)).toDF("id", "w")
    val got = Curation.prioritySample(df, "id", "w", 25, "eq")
      .select(col("id")).as[Long].collect().toSet
    val expected = df
      .withColumn("u", Curation.uniformHash(col("id"), "eq"))
      .orderBy(col("u"), col("id")).limit(25)
      .select(col("id")).as[Long].collect().toSet
    got shouldBe expected
  }

  "groupedPrioritySample (X123)" should "draw each group's k winners independently" in {
    // equal weights: within each group the sample is its k smallest
    // uniformHash values (the X87 argument, per group); a group
    // smaller than k returns whole
    val df = ((1L to 200L).map(i => ("a", i, 5L)) ++
      (201L to 400L).map(i => ("b", i, 5L)) ++
      (401L to 403L).map(i => ("c", i, 5L)))
      .toDF("g", "id", "w")
    val got = Curation.groupedPrioritySample(df, "g", "id", "w", 10, "eq")
      .select(col("g"), col("id")).as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    got("a").size shouldBe 10
    got("b").size shouldBe 10
    got("c") shouldBe Set(401L, 402L, 403L) // whole undersized group
    val expectedA = df.filter(col("g") === "a")
      .withColumn("u", Curation.uniformHash(col("id"), "eq"))
      .orderBy(col("u"), col("id")).limit(10)
      .select(col("id")).as[Long].collect().toSet
    got("a") shouldBe expectedA
    // weight-proportional: an overwhelming weight always wins its group
    val wdf = (1L to 50L).map(i =>
      ("g", i, if (i == 7L) 1000000L else 1L)).toDF("g", "id", "w")
    Curation.groupedPrioritySample(wdf, "g", "id", "w", 1, "s")
      .select(col("id")).as[Long].head() shouldBe 7L
    graft.util.Caches.releaseAll(spark)
  }

  "exactStratifiedSplit (X119)" should "hit exact floor-apportioned sizes per stratum" in {
    // stratum a: 10 rows -> 8/1/1 exactly; stratum b: 7 rows -> 5/1/1
    // (floor cuts at 5.6 -> 5, 6.3 -> 6, 7)
    val df = ((1L to 10L).map(i => (i, "a")) ++
      (11L to 17L).map(i => (i, "b"))).toDF("id", "src")
    val r = Curation.exactStratifiedSplit(df, "id", "src")
      .as[(Long, String, String)].collect()
    r.length shouldBe 17
    val sizes = r.groupBy(t => (t._2, t._3)).view.mapValues(_.length).toMap
    sizes(("a", "train")) shouldBe 8
    sizes(("a", "val")) shouldBe 1
    sizes(("a", "test")) shouldBe 1
    sizes(("b", "train")) shouldBe 5
    sizes(("b", "val")) shouldBe 1
    sizes(("b", "test")) shouldBe 1
    // deterministic: rerun with permuted partitioning is identical
    val again = Curation.exactStratifiedSplit(df.repartition(7), "id",
      "src").as[(Long, String, String)].collect()
    again.sortBy(_._1) shouldBe r.sortBy(_._1)
    // a different seed moves rows between splits but keeps sizes
    val other = Curation.exactStratifiedSplit(df, "id", "src",
      seed = "other").as[(Long, String, String)].collect()
    other.groupBy(t => (t._2, t._3)).view.mapValues(_.length)
      .toMap shouldBe sizes
    graft.util.Caches.releaseAll(spark)
  }

  it should "honor custom split weights" in {
    val df = (1L to 100L).map(i => (i, "s")).toDF("id", "src")
    val r = Curation.exactStratifiedSplit(df, "id", "src",
        splits = Seq(("fit", 3), ("holdout", 1)))
      .as[(Long, String, String)].collect()
    r.count(_._3 == "fit") shouldBe 75
    r.count(_._3 == "holdout") shouldBe 25
    graft.util.Caches.releaseAll(spark)
  }

  "packingEfficiency (X127)" should "report hand-computed fill ratios and utilization" in {
    import spark.implicits._
    // L=10, sep=1: doc1 n=7 at off 0 -> seq0 toks 7; doc2 n=8 at off 8
    // -> seq0 gets 2, seq1 gets 6. Per-seq doc_tokens: seq0=9, seq1=6.
    // utilization = 15 / (2*10) = 0.75
    val docs = Seq((1L, 7L), (2L, 8L)).toDF("doc_id", "n_toks")
    val manifest = graft.curate.Curation.contextManifest(docs,
      "doc_id", "n_toks", contextTokens = 10L, sepTokens = 1L)
    val r = graft.curate.Curation.packingEfficiency(manifest, 10L)
      .as[(Long, Long, Long, Double, Long, Double)].collect()
      .sortBy(_._1)
    r shouldBe Array(
      (0L, 2L, 9L, 0.9, 2L, 0.75),
      (1L, 1L, 6L, 0.6, 2L, 0.75))
    graft.util.Caches.releaseAll(spark)
  }

  "packedSplitLeakage (X129)" should "flag only sequences mixing splits, with majority-split leak counts" in {
    import spark.implicits._
    // L=10, sep=1: doc1 n=7 (off 0, seq0), doc2 n=8 (off 8: seq0 2
    // toks + seq1 6 toks), doc3 n=3 (off 17: seq1). Splits: doc1,doc3
    // train; doc2 test -> seq0 mixes (7 train, 2 test -> leak 2),
    // seq1 mixes (6 test, 3 train -> leak 3).
    val docs = Seq((1L, 7L), (2L, 8L), (3L, 3L)).toDF("doc_id", "n_toks")
    val manifest = graft.curate.Curation.contextManifest(docs,
      "doc_id", "n_toks", contextTokens = 10L, sepTokens = 1L)
    val splits = Seq((1L, "train"), (2L, "test"), (3L, "train"))
      .toDF("doc_id", "split")
    val r = graft.curate.Curation.packedSplitLeakage(manifest, splits)
      .as[(Long, Long, Long, String, Long)].collect().sortBy(_._1)
    r shouldBe Array(
      (0L, 2L, 2L, "test,train", 2L),
      (1L, 2L, 2L, "test,train", 3L))
    // a clean split (everything train) flags nothing
    val clean = Seq((1L, "train"), (2L, "train"), (3L, "train"))
      .toDF("doc_id", "split")
    graft.curate.Curation.packedSplitLeakage(manifest, clean)
      .count() shouldBe 0L
    graft.util.Caches.releaseAll(spark)
  }

  "importanceDiagnostics (X134)" should "compute hand-checked ESS and fail loud on negatives" in {
    import spark.implicits._
    // equal weights: ESS = n (ratio 1)
    val eq = Seq(2.0, 2.0, 2.0, 2.0).toDF("w")
    val r1 = graft.curate.Curation.importanceDiagnostics(eq, col("w"))
      .as[(Long, Double, Option[Double], Option[Double],
        Option[Double])].head()
    r1._1 shouldBe 4L
    r1._3.get shouldBe 4.0 +- 1e-12
    r1._4.get shouldBe 1.0 +- 1e-12
    r1._5.get shouldBe 0.25 +- 1e-12
    // one dominant weight: {9, 1, 1, 1} -> ESS = 144/84
    val skew = Seq(9.0, 1.0, 1.0, 1.0).toDF("w")
    val r2 = graft.curate.Curation.importanceDiagnostics(skew, col("w"))
      .as[(Long, Double, Option[Double], Option[Double],
        Option[Double])].head()
    r2._3.get shouldBe 144.0 / 84.0 +- 1e-12
    r2._5.get shouldBe 0.75
    intercept[IllegalArgumentException] {
      graft.curate.Curation.importanceDiagnostics(
        Seq(1.0, -0.5).toDF("w"), col("w"))
    }
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Curation.curriculumOrder"

  it should "cut equal-height ntile stages with hash-shuffled contiguous sequences" in {
    // 10 rows, 4 stages -> SQL ntile sizes 3,3,2,2; difficulty = id
    val df = (1L to 10L).map(i => (i, i * 10.0)).toDF("doc", "score")
    val r = graft.curate.Curation.curriculumOrder(df, "doc",
      col("score"), stages = 4)
      .as[(Long, Double, Long, Long)].collect()
    val byStage = r.groupBy(_._3).view.mapValues(_.sortBy(_._4)).toMap
    byStage(1L).map(_._1).toSet shouldBe Set(1L, 2L, 3L)
    byStage(2L).map(_._1).toSet shouldBe Set(4L, 5L, 6L)
    byStage(3L).map(_._1).toSet shouldBe Set(7L, 8L)
    byStage(4L).map(_._1).toSet shouldBe Set(9L, 10L)
    // seq runs 1..size within every stage, in md5-of-id order
    byStage.foreach { case (_, rows) =>
      rows.map(_._4) shouldBe (1L to rows.length).toArray
      val hashes = rows.map(t => (md5Hex(t._1.toString), t._1))
      hashes.map(_._1) shouldBe hashes.map(_._1).sorted
    }
    // determinism under a different partitioning
    val r2 = graft.curate.Curation.curriculumOrder(df.repartition(7),
      "doc", col("score"), stages = 4)
      .as[(Long, Double, Long, Long)].collect().toSet
    r2 shouldBe r.toSet
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Curation.groupedKFold (X167)"

  it should "deal size-ranked groups boustrophedon and keep folds balanced" in {
    // groups g1..g10 with sizes 10..1; k=2 snake over rank-1 mod 4:
    // ranks 1,4,5,8,9 -> fold 0 (sizes 10,7,6,3,2 = 28);
    // ranks 2,3,6,7,10 -> fold 1 (sizes 9,8,5,4,1 = 27)
    val rows = (1 to 10).flatMap(g =>
      (1 to (11 - g)).map(_ => s"g$g")).toDF("grp")
    val r = graft.curate.Curation.groupedKFold(rows, "grp", k = 2)
      .as[(String, Long, Long, Long)].collect()
    val byFold = r.groupBy(_._4).view.mapValues(_.map(_._2).sum).toMap
    byFold(0L) shouldBe 28L
    byFold(1L) shouldBe 27L
    r.filter(_._1 == "g1").head._4 shouldBe 0L // rank 1
    r.filter(_._1 == "g2").head._4 shouldBe 1L // rank 2
    r.filter(_._1 == "g3").head._4 shouldBe 1L // rank 3 (snake back)
    r.filter(_._1 == "g4").head._4 shouldBe 0L // rank 4
  }

  it should "assign every group exactly one fold in [0,k) and be partition-invariant" in {
    val rows = (1L to 500L).map(i => s"u${i % 73}").toDF("grp")
    def run(parts: Int) = graft.curate.Curation
      .groupedKFold(rows.repartition(parts), "grp", k = 5)
      .orderBy(col("group"))
      .as[(String, Long, Long, Long)].collect().toSeq
    val a = run(3)
    a shouldBe run(8)
    a.map(_._1).distinct.length shouldBe 73
    all(a.map(_._4)) should (be >= 0L and be < 5L)
    graft.util.Caches.releaseAll(spark)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
