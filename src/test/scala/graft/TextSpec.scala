package graft

import graft.text.{Dedup, TextStats}
import org.apache.spark.sql.functions.{size => asize, _}

class TextSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the mat"),           // exact dup of 1
    (3L, "the cat sat on the red mat"),       // near dup of 1
    (4L, "completely different words here now"))
    .toDF("doc_id", "text")

  it should "compute word shingles with the right window count" in {
    val n = docs.select(asize(Dedup.shingles(col("text"), 3)).as("n"))
      .filter(col("n") > 0).agg(max("n")).as[Int].head()
    n shouldBe 5 // 7 words -> 5 trigrams
    docs.select(asize(Dedup.shingles(lit("a b"), 3)).as("n"))
      .limit(1).as[Int].head() shouldBe 0
  }

  it should "find exact duplicates with canonical min ids" in {
    val r = Dedup.exactDuplicates(docs, "doc_id", "text")
      .filter(col("is_duplicate")).select("doc_id", "canonical_id")
      .as[(Long, Long)].collect()
    r shouldBe Array((2L, 1L))
  }

  it should "pair identical docs with a full minhash agreement" in {
    val pairs = Dedup.minhashNearDuplicates(docs, "doc_id", "text",
      shingleN = 3, k = 16, bands = 4, minMatch = 8)
      .select("doc_a", "doc_b", "n_match").as[(Long, Long, Long)].collect()
    pairs.map(p => (p._1, p._2)) should contain((1L, 2L))
    pairs.find(p => (p._1, p._2) == (1L, 2L)).get._3 shouldBe 16L
    pairs.map(p => (p._1, p._2)) should not contain (1L, 4L)
  }

  it should "give identical texts identical simhash and fingerprint" in {
    val r = docs.select(col("doc_id"),
      Dedup.simhash32(col("text")).as("sh"),
      TextStats.fingerprint(col("text"), 3).as("fp"))
      .as[(Long, Long, String)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    r(1L) shouldBe r(2L)
    r(1L) should not be r(4L)
    // 32-bit range
    all(r.values.map(_._1)) should (be >= 0L and be < (1L << 32))
  }

  it should "find every pair within the simhash Hamming radius (lossless banding)" in {
    // Random-ish corpus via deterministic word soup: brute-force all-pairs
    // Hamming distances vs the banded operator — pigeonhole says banding
    // with maxDist < bands loses nothing.
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val soup = (1L to 40L).map { i =>
      val w = (0 until 12).map(j => vocab(((i * 7 + j * j + 3) % 6).toInt))
      (i, w.mkString(" "))
    }.toDF("doc_id", "text")
    val sims = soup.select(col("doc_id"),
      Dedup.simhash32(col("text")).as("sh")).as[(Long, Long)].collect().toMap
    val expect = (for {
      a <- sims.keys; b <- sims.keys if a < b
      h = java.lang.Long.bitCount(sims(a) ^ sims(b)) if h <= 3
    } yield (a, b, h.toLong)).toSet
    val got = Dedup.simhashNearDuplicates(soup, "doc_id", "text", maxDist = 3)
      .as[(Long, Long, Long)].collect().toSet
    got shouldBe expect
    expect should not be empty // the fixture actually exercises the radius
  }

  it should "give identical texts identical 64-bit simhash halves in 32-bit range" in {
    val r = docs.select(col("doc_id"),
      Dedup.simhash64(col("text")).as("s"))
      .select(col("doc_id"), col("s._1").as("hi"), col("s._2").as("lo"))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    r(1L) shouldBe r(2L)
    r(1L) should not be r(4L)
    all(r.values.flatMap(v => Seq(v._1, v._2))) should
      (be >= 0L and be < (1L << 32))
    // the low half IS the 32-bit simhash (same token bytes drive it)
    val s32 = docs.select(col("doc_id"), Dedup.simhash32(col("text")))
      .as[(Long, Long)].collect().toMap
    r(1L)._2 should not be s32(1L) // hi bytes differ from lo bytes...
    // ...but both halves are majority votes over the same token set, so
    // identical docs agree on both operators
    s32(1L) shouldBe s32(2L)
  }

  it should "find every pair within the 64-bit simhash Hamming radius (lossless 16-bit banding)" in {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val soup = (1L to 40L).map { i =>
      val w = (0 until 12).map(j => vocab(((i * 7 + j * j + 3) % 6).toInt))
      (i, w.mkString(" "))
    }.toDF("doc_id", "text")
    val sims = soup.select(col("doc_id"), Dedup.simhash64(col("text")).as("s"))
      .select(col("doc_id"), col("s._1"), col("s._2"))
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2 << 32) | t._3)).toMap
    val expect = (for {
      a <- sims.keys; b <- sims.keys if a < b
      h = java.lang.Long.bitCount(sims(a) ^ sims(b)) if h <= 3
    } yield (a, b, h.toLong)).toSet
    val got = Dedup.simhashNearDuplicates64(soup, "doc_id", "text", maxDist = 3)
      .as[(Long, Long, Long)].collect().toSet
    got shouldBe expect
    expect should not be empty
  }

  it should "decorrelate signatures with idf weighting while keeping dups at distance 0" in {
    // every doc shares a long stop-phrase plus a few unique rare words:
    // unweighted majority bits are driven by the (more numerous) stop
    // tokens, so signatures collapse toward each other; idf weighting
    // hands the vote to the rare words and signatures spread apart
    val stop = "the quick brown common stop phrase shared by every doc " +
      "always and forever in this corpus"
    val corpus = ((1L to 10L).map(i =>
      (i, s"$stop unique${i}a unique${i}b unique${i}c")) :+
      (99L, s"$stop unique1a unique1b unique1c")) // exact dup of doc 1
      .toDF("doc_id", "text")
    def avgPairHam(sig: Map[Long, (Long, Long)]): Double = {
      val ids = (1L to 10L).toSeq
      val hs = for (a <- ids; b <- ids if a < b) yield
        java.lang.Long.bitCount(sig(a)._1 ^ sig(b)._1) +
          java.lang.Long.bitCount(sig(a)._2 ^ sig(b)._2)
      hs.sum.toDouble / hs.size
    }
    val plain = corpus.select(col("doc_id"),
        Dedup.simhash64(col("text")).as("s"))
      .select(col("doc_id"), col("s._1"), col("s._2"))
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val idf = Dedup.simhash64Idf(corpus, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    avgPairHam(idf) should be > avgPairHam(plain)
    // identical docs still agree exactly, so the banded join finds them
    idf(99L) shouldBe idf(1L)
    val pairs = Dedup.simhashNearDuplicates64Idf(corpus, "doc_id", "text")
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect()
    pairs should contain((1L, 99L, 0L))
  }

  it should "reject simhash banding that cannot be lossless" in {
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDuplicates(docs, "doc_id", "text", maxDist = 4, bands = 4)
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDuplicates64(docs, "doc_id", "text", maxDist = 4)
    }
  }

  it should "compute exact jaccard on the inverted index" in {
    // doc1 trigrams: 4; doc3 trigrams: 5;
    // shared: "the cat sat","cat sat on","sat on the" = 3 -> 3/(4+5-3) = 0.5
    val r = Dedup.jaccardSimilarityJoin(docs.filter(col("doc_id").isin(1, 3)),
      "doc_id", "text", shingleN = 3, threshold = 0.1)
      .select("n_shared", "jaccard").as[(Long, Double)].head()
    r._1 shouldBe 3L
    r._2 shouldBe 0.5
  }

  it should "identify language by stopword hits with alphabetical ties" in {
    val d = Seq((1L, "le chat et la souris est dans les bois"),
      (2L, "xyz qqq")).toDF("doc_id", "text")
    val r = TextStats.languageId(d, "text")
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    r(1L) shouldBe "fr"
    r(2L) shouldBe "de" // all-zero tie -> first language code
  }

  it should "count corpus vocabulary term and document frequencies" in {
    val v = TextStats.vocabulary(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    v("the") shouldBe ((6L, 3L)) // 2+2+2 occurrences across docs 1,2,3
    v("mat") shouldBe ((3L, 3L))
    v("red") shouldBe ((1L, 1L))
    val top = TextStats.topTokens(docs, "doc_id", "text", 2)
      .as[(String, Long, Long)].collect()
    top.head._1 shouldBe "the"
    top.length shouldBe 2
  }

  it should "count whitespace and BPE-ish tokens" in {
    val (nTok, nBpe) = TextStats.tokenCounts(lit("ab 12 cd!"))
    val r = docs.limit(1).select(nTok.as("a"), nBpe.as("b"))
      .as[(Long, Long)].head()
    r shouldBe ((3L, 4L)) // ab|12|cd|! as subword tokens
  }

  it should "compute minhash signatures matching the affine-family definition" in {
    val texts = Seq((1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "alpha beta gamma alpha beta gamma alpha beta"))
    def expected(text: String, k: Int): Seq[Long] = {
      val ws = text.toLowerCase.split("\\s+")
      val mins = Array.fill(k)(Long.MaxValue)
      val md = java.security.MessageDigest.getInstance("MD5")
      ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).foreach { s =>
        val d = md.digest(s.getBytes("UTF-8"))
        val x1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val x2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        for (ki <- 0 until k)
          mins(ki) = math.min(mins(ki), (x1 + ki * x2) % Dedup.MinhashPrime)
      }
      mins.toSeq
    }
    val got = texts.toDF("doc_id", "text")
      .select(col("doc_id"),
        Dedup.minhashSignature(Dedup.shingles(col("text"), 3), 16).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    got(1L) shouldBe expected(texts(0)._2, 16)
    got(2L) shouldBe expected(texts(1)._2, 16)
  }

  it should "flag corpus docs overlapping the eval set by n-grams" in {
    val evalSet = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words alpha beta gamma delta epsilon zeta eta theta suffix"),
      (2L, "totally unrelated content with many distinct words here now"),
      (3L, "short doc")) // fewer than n words -> 0 shared
      .toDF("doc_id", "text")
    val r = Dedup.decontaminate(corpus, "doc_id", "text", evalSet, "text",
      shingleN = 8, minShared = 1)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    r(0) shouldBe ((1L, 1L, true)) // shares the full 8-gram
    r(1) shouldBe ((2L, 0L, false))
    r(2) shouldBe ((3L, 0L, false))
  }

  it should "produce identical rows through the bloom-prefiltered path" in {
    // larger generated corpus: docs 0 mod 7 embed an eval 8-gram; the
    // bloom prefilter + exact verify must reproduce decontaminate
    // row-for-row even at a high-FP bloom sizing (tiny filter, 30% fpp)
    val corpus = (0L until 120L).map { i =>
      val base = (0 until 12).map(j => s"w${i}_$j").mkString(" ")
      val planted = if (i % 7 == 0)
        " alpha beta gamma delta epsilon zeta eta theta" else ""
      (i, base + planted)
    }.toDF("doc_id", "text")
    val evalSet = Seq(
      (900L, "alpha beta gamma delta epsilon zeta eta theta tail words"))
      .toDF("doc_id", "text")
    val exact = Dedup.decontaminate(corpus, "doc_id", "text",
        evalSet, "text", shingleN = 8)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val bloomed = Dedup.decontaminateBloom(corpus, "doc_id", "text",
        evalSet, "text", shingleN = 8,
        expectedItems = 100, fpp = 0.3)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    bloomed shouldBe exact
    bloomed.count(_._3) shouldBe 18 // ceil(120/7) planted docs flagged
  }

  it should "reduce hosts to registrable domains and block subdomains" in {
    import graft.text.TextStats
    val rows = TextStats.domainVerdict(Seq(
      (1L, "https://spam.biz/p"),          // blocked exactly
      (2L, "https://sub.spam.biz/x"),      // subdomain of blocked
      (3L, "https://news.site.co.uk/y"),   // cc-TLD: 3-label domain
      (4L, "http://WWW.Example.COM/z"),    // case-folded, www stripped
      (5L, "relative/path"),               // no host -> never blocked
      (6L, "https://ok.org"))              // bare host, no path
      .toDF("doc_id", "url"), "url", Seq("spam.biz"))
      .select("doc_id", "host", "registered_domain", "is_blocked")
      .collect().sortBy(_.getLong(0))
    rows.map(r => (Option(r.getString(2)), r.getBoolean(3))).toSeq shouldBe
      Seq((Some("spam.biz"), true), (Some("spam.biz"), true),
        (Some("site.co.uk"), false), (Some("example.com"), false),
        (None, false), (Some("ok.org"), false))
  }

  it should "normalize markup, urls, control bytes and whitespace" in {
    import graft.text.TextStats
    val rows = TextStats.normalizeText(Seq(
      (1L, "hello <b>world</b> visit https://x.io/a?b=1 now"),
      (2L, "ab   c\t\nd"),
      (3L, "pre<i>tag</i>post")) // tag replaced by space: words never fuse
      .toDF("doc_id", "text"), "text")
      .select("doc_id", "n_html_tags", "n_urls", "n_control_chars",
        "norm_text")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    rows(0) shouldBe ((1L, 2L, 1L, 0L, "hello world visit now"))
    rows(1) shouldBe ((2L, 0L, 0L, 1L, "a b c d"))
    rows(2) shouldBe ((3L, 2L, 0L, 0L, "pre tag post"))
    // NFC: e + combining acute collapses to the precomposed é
    Seq(("café")).toDF("t")
      .select(TextStats.nfcNormalize(col("t")).as("n"))
      .as[String].head() shouldBe "café"
  }

  it should "apply the Gopher-style quality rules with named flags" in {
    import graft.text.TextStats
    val good = (("the quick brown fox jumps of a and is many words here " * 4)
      .trim)
    val rows = TextStats.qualityRuleVerdict(Seq(
      (1L, good),                         // passes everything (minWords=10)
      (2L, "too short"),                  // fails word count + stopwords
      (3L, ("spam " * 40).trim))          // fails repetition rules
      .toDF("doc_id", "text"), "doc_id", "text",
      minWords = 10, maxWords = 1000)
      .select("doc_id", "rule_word_count", "rule_stopwords",
        "rule_dup_ngrams", "rule_top_word", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().sortBy(_._1)
    rows(0)._6 shouldBe false // "many words here" repeats -> dup rule
    rows(0)._4 shouldBe false // the dup-ngram rule is what fails
    rows(0)._2 shouldBe true
    rows(0)._3 shouldBe true
    rows(1) shouldBe ((2L, false, false, true, false, false))
    rows(2) shouldBe ((3L, true, false, false, false, false))
  }

  it should "verify lexical near-dup candidates semantically" in {
    // three byte-identical texts → lexical pairs (1,2), (1,3), (2,3);
    // embeddings align 1↔2, oppose 1↔3 and 2↔3, and doc 4 (also
    // identical text) has NO embedding — only the semantically-agreeing
    // pair survives, and unverifiable docs drop
    val txt = "the cat sat on the mat and then slept all day long"
    val docs = Seq((1L, txt), (2L, txt), (3L, txt), (4L, txt))
      .toDF("doc_id", "text")
    val emb = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.9, 0.1)), (3L, Array(-1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val kept = Dedup.semanticVerifiedNearDuplicates(docs, "doc_id", "text",
      emb, "vec_id", "embedding", minCosine = 0.5)
      .select("doc_a", "doc_b", "n_match").as[(Long, Long, Long)].collect()
    kept.map(p => (p._1, p._2)).toSet shouldBe Set((1L, 2L))
    kept.head._3 shouldBe 16L // full signature agreement rides along
  }

  it should "count adjacent BPE merge pairs with doc frequencies" in {
    val d = Seq((1L, "a b a b c"), (2L, "a b")).toDF("doc_id", "text")
    val pairs = TextStats.bpePairFrequencies(d, "doc_id", "text")
      .as[(String, String, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    pairs shouldBe Map(
      ("a", "b") -> ((3L, 2L)), ("b", "a") -> ((1L, 1L)),
      ("b", "c") -> ((1L, 1L)))
    TextStats.topPairs(d, "doc_id", "text", 1)
      .as[(String, String, Long, Long)].head() shouldBe (("a", "b", 3L, 2L))
  }

  it should "compose curation into per-stage verdicts with one corpus scan" in {
    import graft.curate.Curation
    val good = ("the quick brown fox of a and is " +
      (1 to 30).map(i => s"word$i").mkString(" ")) // long enough words
    val corpus = Seq(
      (1L, good),                    // canonical, passes quality
      (2L, good),                    // exact dup of 1 (after normalize)
      (3L, s"  $good  "),            // whitespace-variant dup of 1
      (4L, "too short")).toDF("doc_id", "text")
    val r = Curation.curationPipeline(corpus, "doc_id", "text",
      minWords = 10, maxWords = 100, sampleFraction = 1.0)
      .select("doc_id", "keep_quality", "canonical_id", "is_canonical",
        "sampled", "keep")
      .as[(Long, Boolean, Long, Boolean, Boolean, Boolean)]
      .collect().sortBy(_._1)
    // normalization runs BEFORE dedup: the whitespace variant groups too
    r.map(x => (x._1, x._3)) shouldBe
      Array((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
    r.map(_._6) shouldBe Array(true, false, false, false)
    r(3)._2 shouldBe false // quality, not dedup, is what drops doc 4
    graft.util.Caches.releaseAll(spark)
  }

  it should "measure within-document repetition" in {
    val d = Seq(
      (1L, "spam spam spam spam spam spam"),   // one word, all 3-grams equal
      (2L, "one two three four five six"))     // all distinct
      .toDF("doc_id", "text")
    val r = TextStats.repetitionStats(d, "doc_id", "text")
      .select("doc_id", "dup_ngram_ratio", "top_word_ratio")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    r(0)._2 shouldBe 0.75 // 4 grams, 1 distinct -> 3/4 duplicated
    r(0)._3 shouldBe 1.0
    r(1)._2 shouldBe 0.0
    r(1)._3 shouldBe (1.0 / 6 +- 1e-4)
  }

  it should "compose exact dedup and near-dup clustering into one keep/drop decision" in {
    // docs 1/2 identical text (exact group, canonical 1); doc 3 near-dup of
    // them (same text - clusters with 1 after 2 is dropped); doc 4 unique
    val d = Seq(
      (1L, "the cat sat on the mat and then slept all day"),
      (2L, "the cat sat on the mat and then slept all day"),
      (3L, "the cat sat on the mat and then slept all night"),
      (4L, "completely different words about embedded systems and rust"))
      .toDF("doc_id", "text")
    val r = Dedup.dedupPipeline(d, "doc_id", "text", shingleN = 3, k = 16,
      bands = 4, minMatch = 8)
      .select("doc_id", "exact_canonical", "keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    r(0) shouldBe ((1L, 1L, true))   // exact + cluster canonical
    r(1) shouldBe ((2L, 1L, false))  // exact duplicate of 1
    r(2)._2 shouldBe 3L              // its own exact group...
    r(2)._3 shouldBe false           // ...but clustered under canonical 1
    r(3) shouldBe ((4L, 4L, true))   // untouched unique doc
  }

  it should "classify an incremental batch as exact, near, or new against a corpus" in {
    val corpus = Seq(
      (1L, "the cat sat on the mat and then slept all day"),
      (2L, "the quick brown fox jumps over the lazy sleeping dog"),
      (3L, "completely different words about embedded systems and rust"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the cat sat on the mat and then slept all day"),   // exact of 1
      (11L, "the cat sat on the mat and then slept all night"), // near of 1
      (12L, "unrelated new content with entirely fresh tokens today"))
      .toDF("doc_id", "text")
    val r = Dedup.incrementalDedup(corpus, batch, "doc_id", "text",
      shingleN = 3, k = 16, bands = 4, minMatch = 8)
      .orderBy("doc_id")
      .select("doc_id", "verdict").as[(Long, String)].collect()
    r shouldBe Array((10L, "exact"), (11L, "near"), (12L, "new"))
    // an exact dup is also a full-agreement near dup of its source
    val row10 = Dedup.incrementalDedup(corpus, batch, "doc_id", "text")
      .filter(col("doc_id") === 10L)
      .select("exact_dup_of", "near_dup_of", "n_near_dups")
      .as[(Long, Long, Long)].head()
    row10 shouldBe ((1L, 1L, 1L))
    // corpus docs never pair with each other: a batch of one unique doc
    // yields exactly one 'new' row even though corpus docs 1/2/3 coexist
    val lone = Dedup.incrementalDedup(corpus,
      Seq((20L, "nothing shared here at all between these words"))
        .toDF("doc_id", "text"), "doc_id", "text")
      .select("verdict").as[String].collect()
    lone shouldBe Array("new")
  }

  it should "answer incremental dedup from a persisted index alone" in {
    val corpus = Seq(
      (1L, "the cat sat on the mat and then slept all day"),
      (2L, "the quick brown fox jumps over the lazy sleeping dog"),
      (3L, "completely different words about embedded systems and rust"),
      (4L, "tiny doc")) // < shingleN words -> NULL-band index row
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the cat sat on the mat and then slept all day"),   // exact of 1
      (11L, "the cat sat on the mat and then slept all night"), // near of 1
      (12L, "tiny doc"),                                        // exact of short 4
      (13L, "unrelated new content with entirely fresh tokens today"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_dedup").toString
    corpus.write.parquet(s"$tmp/corpus_store")
    val corpusPq = spark.read.parquet(s"$tmp/corpus_store")
    Dedup.buildDedupIndex(corpusPq, "doc_id", "text")
      .write.parquet(s"$tmp/idx_store")
    val index = spark.read.parquet(s"$tmp/idx_store")
    val viaIndex = Dedup.incrementalDedupIndexed(index, batch,
      "doc_id", "text")
    val viaCorpus = Dedup.incrementalDedup(corpusPq, batch, "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "exact_dup_of", "near_dup_of", "n_near_dups", "verdict")
      .collect().map(_.toString).sorted.toSeq
    rows(viaIndex) shouldBe rows(viaCorpus)
    // the short corpus doc is matchable exactly through its NULL-band row
    viaIndex.filter(col("doc_id") === 12L).select("verdict", "exact_dup_of")
      .as[(String, Long)].head() shouldBe (("exact", 4L))
    // index-only: the plan scans the index parquet and NEVER the corpus
    val plan = viaIndex.queryExecution.executedPlan.toString
    plan should include("idx_store")
    plan should not include "corpus_store"
  }

  it should "survive null, empty and single-word texts across every dedup operator" in {
    // production corpora contain nulls and fragments; no operator may
    // throw, and the accounting must stay sane
    val messy = Seq[(Long, String)](
      (1L, null), (2L, ""), (3L, "word"),
      (4L, "the cat sat on the mat"),
      (5L, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    noException should be thrownBy
      Dedup.exactDuplicates(messy, "doc_id", "text").collect()
    // null-text docs never exact-match real text (md5(null) joins nothing
    // downstream); the two real dups still pair
    val pipeline = Dedup.dedupPipeline(messy, "doc_id", "text").collect()
    pipeline.length shouldBe 5
    noException should be thrownBy
      Dedup.minhashNearDuplicates(messy, "doc_id", "text").collect()
    noException should be thrownBy
      Dedup.simhashNearDuplicates(messy, "doc_id", "text").collect()
    noException should be thrownBy
      Dedup.simhashNearDuplicates64(messy, "doc_id", "text").collect()
    noException should be thrownBy
      Dedup.jaccardSimilarityJoin(messy, "doc_id", "text").collect()
    noException should be thrownBy
      Dedup.decontaminate(messy, "doc_id", "text",
        messy.filter(col("doc_id") === 4L), "text").collect()
    // index path: unshingleable docs land on NULL-band rows, and a
    // null-text batch doc matches the corpus's null-text doc (null-safe
    // hash join — same semantics as exactDuplicates)
    val index = Dedup.buildDedupIndex(messy, "doc_id", "text")
    index.filter(col("band").isNull).count() shouldBe 3 // null, "", "word"
    val verdicts = Dedup.incrementalDedupIndexed(index,
      Seq[(Long, String)]((10L, null), (11L, "the cat sat on the mat"))
        .toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "verdict", "exact_dup_of")
      .as[(Long, String, Option[Long])].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    verdicts(10L) shouldBe (("exact", Some(1L)))
    verdicts(11L) shouldBe (("exact", Some(4L)))
    graft.util.Caches.releaseAll(spark)
  }

  it should "answer identically through the index on random corpora (property)" in {
    // randomized cross-check of the index path: for several seeds, a
    // random corpus/batch split with planted exact and near copies must
    // produce byte-identical verdicts via buildDedupIndex +
    // incrementalDedupIndexed and via the direct corpus form
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val pool = (1 to 30).map { id =>
        val words = Seq.fill(2 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        (id.toLong, words.mkString(" "))
      }
      val (corpusRows, batchBase) = pool.partition(_._1 % 3 != 0)
      val batchRows = batchBase ++
        corpusRows.filter(_._1 % 4 == 1)
          .map { case (id, t) => (id + 500L, t) } ++          // exact copies
        corpusRows.filter(_._1 % 4 == 2)
          .map { case (id, t) => (id + 900L, t + " tail") }   // perturbed
      val corpus = corpusRows.toDF("doc_id", "text")
      val batch = batchRows.toDF("doc_id", "text")
      val index = Dedup.buildDedupIndex(corpus, "doc_id", "text")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toString).sorted.toSeq
      rows(Dedup.incrementalDedupIndexed(index, batch, "doc_id", "text")) shouldBe
        rows(Dedup.incrementalDedup(corpus, batch, "doc_id", "text"))
    }
  }

  it should "match a naive cross-corpus Jaccard on random skewed corpora (R x S prefix filtering is lossless)" in {
    // same adversarial setup as the self-join property: a planted
    // stop-phrase shared by most docs on BOTH sides, plus cross-side
    // duplicates so high-jaccard links exist at every threshold
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    def mkCorpus(n: Int, base: Long): Seq[(Long, String)] = (1 to n).map { i =>
      val words = Seq.fill(4 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
      val full =
        if (rnd.nextInt(4) > 0) "the common stop phrase".split(" ").toSeq ++ words
        else words
      (base + i, full.mkString(" "))
    }
    for (trial <- 1 to 2) {
      val t = 0.3 + 0.2 * trial // thresholds 0.5, 0.7
      val leftRows = mkCorpus(25, 0L)
      val rightRows = mkCorpus(25, 1000L) ++
        leftRows.take(5).map { case (id, text) => (id + 2000L, text) }
      def shingleSet(text: String): Set[String] =
        text.toLowerCase.split("\\s+").sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      val expected = (for {
        (ida, ta) <- leftRows; (idb, tb) <- rightRows
        sa = shingleSet(ta); sb = shingleSet(tb)
        if sa.nonEmpty && sb.nonEmpty
        inter = (sa & sb).size
        j = inter.toDouble / (sa.size + sb.size - inter)
        if j >= t
      } yield (ida, idb, inter.toLong)).toSet
      val got = Dedup.jaccardSimilarityJoinBetween(
        leftRows.toDF("doc_id", "text"), rightRows.toDF("doc_id", "text"),
        "doc_id", "text", shingleN = 3, threshold = t)
        .select("doc_a", "doc_b", "n_shared")
        .as[(Long, Long, Long)].collect().toSet
      got shouldBe expected
      expected should not be empty
    }
    graft.util.Caches.releaseAll(spark)
  }

  it should "keep Jaccard candidates O(docs) under a planted stop-phrase (skew stress)" in {
    // The adversarial input PPJoin exists for: a stop-phrase shared by
    // ~40% of the corpus. An unguarded inverted index would emit a join
    // row for every pair of sharers — (0.4n choose 2), quadratic — while
    // the rare-first prefix filter must keep the candidate set linear in
    // the corpus. Results are simultaneously checked against naive
    // all-pairs truth, so the filter is tight AND lossless.
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val n = 200
    val corpus = (1 to n).map { id =>
      val base = Seq.fill(5 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
      val words = // ~40% of docs carry the planted hot phrase
        if (rnd.nextInt(5) < 2) "the common stop phrase".split(" ").toSeq ++ base
        else base
      (id.toLong, words.mkString(" "))
    }
    val hotSharers = corpus.count(_._2.startsWith("the common stop phrase"))
    hotSharers.toDouble / n should (be >= 0.3 and be <= 0.5)
    val hotPairs = hotSharers.toLong * (hotSharers - 1) / 2 // naive blow-up
    def shingleSet(text: String): Set[String] =
      text.toLowerCase.split("\\s+").sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    for (t <- Seq(0.5, 0.8)) {
      val (_, cand) = Dedup.jaccardCandidateStage(
        corpus.toDF("doc_id", "text"), "doc_id", "text",
        shingleN = 3, threshold = t)
      val nCand = cand.count()
      nCand should be <= 4L * n       // linear in docs, generous slack
      nCand should be < hotPairs / 4  // nowhere near the quadratic blow-up
      val expected = (for {
        (ida, ta) <- corpus; (idb, tb) <- corpus if ida < idb
        sa = shingleSet(ta); sb = shingleSet(tb)
        if sa.nonEmpty && sb.nonEmpty
        inter = (sa & sb).size
        j = inter.toDouble / (sa.size + sb.size - inter)
        if j >= t
      } yield (ida, idb, inter.toLong)).toSet
      Dedup.jaccardSimilarityJoin(corpus.toDF("doc_id", "text"), "doc_id",
        "text", shingleN = 3, threshold = t)
        .select("doc_a", "doc_b", "n_shared")
        .as[(Long, Long, Long)].collect().toSet shouldBe expected
      graft.util.Caches.releaseAll(spark)
    }
  }

  it should "match a naive all-pairs Jaccard on random skewed corpora (prefix filtering is lossless)" in {
    // Random docs built from a small vocabulary PLUS a planted stop-phrase
    // shared by most docs — the exact posting-list skew prefix filtering
    // exists to survive. The naive reference implementation is plain Scala
    // over the same shingle definition.
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    for (trial <- 1 to 3) {
      val t = 0.3 + 0.2 * trial // thresholds 0.5, 0.7, 0.9
      val corpus = (1 to 40).map { id =>
        val base = Seq.fill(4 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        val words =
          if (rnd.nextInt(4) > 0) "the common stop phrase".split(" ").toSeq ++ base
          else base
        (id.toLong, words.mkString(" "))
      }
      // duplicate a few docs so high-jaccard pairs exist at every threshold
      val withDups = corpus ++ corpus.take(6)
        .map { case (id, text) => (id + 100L, text) }
      def shingleSet(text: String): Set[String] =
        text.toLowerCase.split("\\s+").sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      val expected = (for {
        (ida, ta) <- withDups; (idb, tb) <- withDups if ida < idb
        sa = shingleSet(ta); sb = shingleSet(tb)
        if sa.nonEmpty && sb.nonEmpty
        inter = (sa & sb).size
        j = inter.toDouble / (sa.size + sb.size - inter)
        if j >= t
      } yield (ida, idb, inter.toLong)).toSet
      val got = Dedup.jaccardSimilarityJoin(
        withDups.toDF("doc_id", "text"), "doc_id", "text",
        shingleN = 3, threshold = t)
        .select("doc_a", "doc_b", "n_shared")
        .as[(Long, Long, Long)].collect().toSet
      got shouldBe expected
    }
  }

  "paragraphNearDupStats" should "roll cross-document paragraph duplication up to docs" in {
    val shared = "shared paragraph of exactly seven words here"
    val selfdup = "identical internal paragraph of five words"
    val corpus = Seq(
      (1L, s"the quick brown fox jumps over the lazy dog\n\n$shared"),
      (2L, s"$shared\n\ncompletely different second content paragraph words"),
      (3L, "totally unrelated text about nothing in particular at all\n\nok"),
      (4L, s"$selfdup\n\n$selfdup")) // same-DOC repetition: not dedup's job
      .toDF("doc_id", "text")
    val out = Dedup.paragraphNearDupStats(corpus, "doc_id", "text")
      .select("doc_id", "n_paras", "n_dup_paras", "dup_para_fraction")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    out shouldBe Seq(
      (1L, 2L, 1L, 0.5), // second para shared with doc 2
      (2L, 2L, 1L, 0.5),
      (3L, 2L, 0L, 0.0), // unique; the short para can't even sign
      (4L, 2L, 0L, 0.0)) // cross-doc only — self-repeat excluded
    // excision drops exactly the flagged paragraphs, preserving the
    // survivors byte-for-byte (original casing, original order)
    val kept = Dedup.exciseDuplicateParagraphs(corpus, "doc_id", "text")
      .select("doc_id", "kept_text").as[(Long, String)].collect().toMap
    kept(1L) shouldBe "the quick brown fox jumps over the lazy dog"
    kept(2L) shouldBe "completely different second content paragraph words"
    kept(3L) shouldBe "totally unrelated text about nothing in particular at all\n\nok"
    kept(4L) shouldBe s"$selfdup\n\n$selfdup" // self-repeat untouched
    // a doc that is ALL shared boilerplate excises to empty, not dropped
    val allBp = corpus.unionByName(
      Seq((5L, shared)).toDF("doc_id", "text"))
    Dedup.exciseDuplicateParagraphs(allBp, "doc_id", "text")
      .filter(col("doc_id") === 5L)
      .select("kept_text").as[String].head() shouldBe ""
  }

  "bigramPerplexity" should "score docs against the hand-computed self-trained model" in {
    val corpus = Seq(
      (1L, "a b a b a b"),      // the corpus's common bigrams
      (2L, "x y z w q r"),      // every bigram unique
      (3L, "solo"))             // no bigrams at all
      .toDF("doc_id", "text")
    val out = TextStats.bigramPerplexity(corpus, "doc_id", "text")
      .select("doc_id", "n_bigrams", "perplexity")
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    // V = 9 distinct tokens; c(a)=c(b)=3, others 1; c(ab)=3, c(ba)=2,
    // doc-2 bigrams each 1. alpha = 0.4.
    val v = 9; val al = 0.4
    def p(cab: Long, ca: Long) = (cab + al) / (ca + al * v)
    def ppl(ps: Seq[Double]) =
      BigDecimal(math.exp(ps.map(x => -math.log(x)).sum / ps.size))
        .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ppl1 = ppl(Seq(p(3, 3), p(2, 3), p(3, 3), p(2, 3), p(3, 3)))
    val ppl2 = ppl(Seq.fill(5)(p(1, 1)))
    out(0) shouldBe ((1L, 5L, Some(ppl1)))
    out(1) shouldBe ((2L, 5L, Some(ppl2)))
    out(2) shouldBe ((3L, 0L, None)) // kept, not dropped
    ppl1 should be < ppl2 // fluent-under-the-model scores lower
  }

  "bpeTrain" should "learn ranked merges matching a hand-computed trace" in {
    val corpus = Seq((1L, "a b a b c"), (2L, "a b c d")).toDF("doc_id", "text")
    // pairs: (a,b)=3 (b,a)=1 (b,c)=2 (c,d)=1 → rule 1: (a,b) f=3
    // then docs are [ab, ab, c] / [ab, c, d]:
    //   (ab,ab)=1 (ab,c)=2 (c,d)=1 → rule 2: ("a b", c) f=2
    // then [ab, abc] / [abc, d]: (ab,abc)=1 (abc,d)=1 → tie broken by
    // token_a asc: "a b" < "a b c" → rule 3: ("a b", "a b c") f=1
    val merges = TextStats.bpeTrain(corpus, "doc_id", "text", 3)
      .select("merge_rank", "token_a", "token_b", "pair_freq")
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    merges shouldBe Seq(
      (1L, "a", "b", 3L),
      (2L, "a b", "c", 2L),
      (3L, "a b", "a b c", 1L))
  }

  it should "apply merges greedily left-to-right on self-adjacent pairs" in {
    // BPE apply semantics: "x x x x" under rule (x,x) → [xx, xx], the
    // first match consumes its right token (never [xx, xx, x] fragments
    // or an overlapping triple)
    val corpus = Seq((1L, "x x x x"), (2L, "x x x")).toDF("doc_id", "text")
    val out = TextStats.applyMerges(corpus, "doc_id", "text",
      Seq(("x", "x")))
      .select("doc_id", "tokens").as[(Long, Seq[String])].collect().toMap
    out(1L) shouldBe Seq("x x", "x x")
    out(2L) shouldBe Seq("x x", "x")
  }

  it should "feed applyMerges token counts into sequence packing end-to-end" in {
    val corpus = Seq(
      (1L, "a b a b c"), (2L, "a b c d"), (3L, "a b a b a b"),
      (4L, "c d c d"))
      .toDF("doc_id", "text")
    val table = TextStats.bpeTrain(corpus, "doc_id", "text", 2)
      .select("token_a", "token_b").as[(String, String)]
      .collect().toSeq
    val tokenized = TextStats.applyMerges(corpus, "doc_id", "text", table)
      .withColumn("shard", lit(0L))
    // merges compress: every doc's BPE token count is below its word count
    val counts = tokenized.select("doc_id", "n_tokens")
      .as[(Long, Long)].collect().toMap
    counts(3L) should be < 6L
    // and the packer consumes the learned counts directly
    val packed = graft.curate.Curation.packSequences(tokenized,
      "n_tokens", "shard", "doc_id", tokenBudget = 5)
      .select("doc_id", "pack_id", "pack_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    packed.map(_._1) shouldBe Seq(1L, 2L, 3L, 4L)
    // offsets are the running sum of the POST-merge counts
    val expectedOffsets = packed.map(_._1).map(counts)
      .scanLeft(0L)(_ + _).dropRight(1)
    packed.map(t => t._3 + t._2 * 5) shouldBe expectedOffsets
  }

  "SubstringDedup" should "find maximal cross-document spans at window resolution" in {
    import graft.text.SubstringDedup
    // docs 1 and 2 share tokens 5..12 of doc 1 (an 8-token span planted
    // mid-document); doc 3 is fully unique; doc 4 is too short to window
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (1L, s"u1 u2 u3 u4 u5 $shared v1 v2 v3"),
      (2L, s"w1 w2 $shared x1"),
      (3L, "y1 y2 y3 y4 y5 y6 y7 y8 y9 y10"),
      (4L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(corpus, "doc_id", "text", 8)
      .select("doc_id", "span_start", "span_end", "span_tokens")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    spans shouldBe Seq((1L, 5L, 13L, 8L), (2L, 2L, 10L, 8L))
  }

  it should "merge overlapping and adjacent duplicated windows into one span" in {
    import graft.text.SubstringDedup
    // 16 shared tokens → windows at every offset 0..8 on the copy;
    // they must merge to ONE [start, start+16) span, not 9 fragments
    val shared = (1 to 16).map(i => s"s$i").mkString(" ")
    val corpus = Seq(
      (1L, s"a1 a2 $shared b1 b2"),
      (2L, s"$shared c1 c2 c3"))
      .toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(corpus, "doc_id", "text", 8)
      .select("doc_id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    spans shouldBe Seq((1L, 2L, 18L), (2L, 0L, 16L))
  }

  it should "answer incremental spans from the index, ignoring batch-internal sharing" in {
    import graft.text.SubstringDedup
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (1L, s"c1 c2 $shared c3"),
      (2L, "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10"))
      .toDF("doc_id", "text")
    val batchOnly = "bb1 bb2 bb3 bb4 bb5 bb6 bb7 bb8 bb9"
    val batch = Seq(
      (10L, s"n1 n2 $shared n3 n4"), // shares the corpus span
      (11L, batchOnly),              // shared ONLY batch-internally
      (12L, batchOnly),
      (13L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")) // novel
      .toDF("doc_id", "text")
    val idx = SubstringDedup.buildSpanIndex(corpus, "doc_id", "text", 8)
    val spans = SubstringDedup.incrementalDuplicatedSpans(idx, batch,
      "doc_id", "text", 8)
      .select("doc_id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    // only the corpus-shared span reports; batch-internal sharing (11/12)
    // and novel docs are silent
    spans shouldBe Seq((10L, 2L, 10L))
    // and the composed check: appending the batch to the index makes a
    // re-probe of doc 11's text report its (now indexed) twin
    val idx2 = idx.unionByName(
      SubstringDedup.buildSpanIndex(batch, "doc_id", "text", 8))
    SubstringDedup.incrementalDuplicatedSpans(idx2,
      Seq((20L, batchOnly)).toDF("doc_id", "text"), "doc_id", "text", 8)
      .count() shouldBe 1L
  }

  it should "excise duplicated spans while preserving all other text" in {
    import graft.text.SubstringDedup
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (1L, s"u1 u2 u3 u4 u5 $shared v1 v2 v3"),
      (2L, s"w1 w2 $shared x1"),
      (3L, "y1 y2 y3 y4 y5 y6 y7 y8 y9 y10"))
      .toDF("doc_id", "text")
    val out = SubstringDedup.exciseDuplicates(corpus, "doc_id", "text", 8)
      .select("doc_id", "kept_text", "n_tokens", "n_dup_tokens")
      .as[(Long, String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    out(1L) shouldBe (("u1 u2 u3 u4 u5 v1 v2 v3", 16L, 8L))
    out(2L) shouldBe (("w1 w2 x1", 11L, 8L))
    out(3L) shouldBe (("y1 y2 y3 y4 y5 y6 y7 y8 y9 y10", 10L, 0L)) // untouched
    // a fully-duplicated doc excises to empty, not a dropped row
    val dup = Seq((1L, shared), (2L, shared)).toDF("doc_id", "text")
    SubstringDedup.exciseDuplicates(dup, "doc_id", "text", 8)
      .select("kept_text").as[String].collect().toSeq shouldBe Seq("", "")
  }

  it should "bucket docs into per-language perplexity thirds" in {
    import graft.text.TextStats
    // six scoreable docs (distinct fluency -> tie-free perplexities)
    // plus one unscorable single-token doc
    val corpus = Seq(
      (1L, "the cat sat on the mat and the cat sat", "en"),
      (2L, "the dog sat on the mat and a dog ran", "en"),
      (3L, "a cat and a dog sat on a mat", "en"),
      (4L, "quantum flux capacitors destabilize chrono spatial manifolds", "en"),
      (5L, "zebra umbrella xylophone quixotic jughandle vortex", "en"),
      (6L, "the mat sat on the cat and the mat sat", "en"),
      (7L, "solo", "en"))
      .toDF("doc_id", "text", "lang")
    val exact = TextStats.perplexityBuckets(corpus, "doc_id", "text", "lang")
      .select("doc_id", "bucket", "ppl_rank")
      .as[(Long, String, Option[Double])].collect()
      .map(t => t._1 -> t).toMap
    // 6 ranked docs split 2/2/2; the single-token doc is outside the rank
    exact.values.map(_._2).groupBy(identity).view.mapValues(_.size).toMap shouldBe
      Map("head" -> 2, "middle" -> 2, "tail" -> 2, "unscored" -> 1)
    exact(7L) shouldBe ((7L, "unscored", None))
    // ranks are the percent_rank lattice 0, 0.2, ..., 1 over 6 rows
    exact.values.flatMap(_._3).toSeq.sorted shouldBe
      Seq(0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
    // the cutoff (scale) form reproduces the exact form on tie-free data
    val byCut = TextStats.perplexityBucketsByCutoff(
        corpus, "doc_id", "text", "lang")
      .select("doc_id", "bucket")
      .as[(Long, String)].collect().toMap
    exact.values.foreach { case (id, b, _) => byCut(id) shouldBe b }
  }

  it should "keep only the first occurrence of each line corpus-wide" in {
    val corpus = Seq(
      (1L, "unique one\nshared footer\n\nunique two"),
      (2L, "shared footer\nits own line\nshared footer"),
      (3L, "  \nonly here"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val r = Dedup.lineDeduplicate(corpus, "doc_id", "text")
      .select("doc_id", "n_lines", "n_kept", "dedup_text")
      .as[(Long, Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // doc 1 is first everywhere: byte-identical round trip, blank kept
    r(1L) shouldBe ((4L, 4L, "unique one\nshared footer\n\nunique two"))
    // doc 2 loses BOTH copies of the already-seen footer (global rule
    // covers within-doc repeats too)
    r(2L) shouldBe ((3L, 1L, "its own line"))
    // whitespace-only lines are structure: kept, never evidence
    r(3L) shouldBe ((2L, 2L, "  \nonly here"))
    // NULL text behaves as empty — one blank line, kept
    r(4L) shouldBe ((1L, 1L, ""))
  }

  it should "hit every stupid-backoff branch with hand-computed scores" in {
    // train "a b c a b d": tri counts {abc,bca,cab,abd}=1; bi "a b"=2,
    // {"b c","c a","b d"}=1; uni a=2 b=2 c=1 d=1, N=6
    val train = Seq((0L, "a b c a b d")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b c"),   // trigram branch: S = 1/2
      (2L, "b c d"),   // unigram branch: S = 0.4² · 1/6
      (3L, "d a b"),   // bigram branch: S = 0.4 · 2/2
      (4L, "z z z"),   // floor branch: S = 0.4²/6 (same value as doc 2)
      (5L, "a b"))     // too short: 0 trigrams, NULL score
      .toDF("doc_id", "text")
    val r = TextStats.stupidBackoffScore(train, score, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), Option(x.get(2)).map(_.asInstanceOf[Double]))))
      .toMap
    r(1L)._1 shouldBe 1L
    r(1L)._2.get shouldBe -math.log(0.5) +- 5e-4
    r(2L)._2.get shouldBe -math.log(0.4 * 0.4 * 1.0 / 6) +- 5e-4
    r(3L)._2.get shouldBe -math.log(0.4) +- 5e-4
    r(4L)._2.get shouldBe r(2L)._2.get
    r(5L) shouldBe ((0L, None))
  }

  "minhashCalibration (X114)" should "report exact Jaccard 1 with zero error for identical docs" in {
    val text = (1 to 30).map(i => s"tok$i").mkString(" ")
    val other = (100 to 130).map(i => s"zzz$i").mkString(" ")
    val df = Seq((1L, text), (2L, text), (3L, other))
      .toDF("doc_id", "text")
    val r = graft.text.Dedup.minhashCalibration(df, "doc_id", "text")
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
        col("jaccard"), col("abs_err"))
      .as[(Long, Long, Double, Double, Double)].collect()
    // identical docs: every permutation agrees AND exact J = 1
    val pair = r.find(p => p._1 == 1L && p._2 == 2L).get
    pair._3 shouldBe 1.0
    pair._4 shouldBe 1.0
    pair._5 shouldBe 0.0
    // disjoint doc 3 shares no band with either: not a candidate
    r.map(p => (p._1, p._2)).toSet shouldBe Set((1L, 2L))
    graft.util.Caches.releaseAll(spark)
  }

  "ngramNovelty (X110)" should "count unseen distinct shingles against the reference" in {
    val ref = Seq((0L, "a b c d e f")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b c d e"),       // its single 5-gram IS in the reference
      (2L, "a b c d e x y z"), // 4 shingles: 1 seen, 3 unseen
      (3L, "q r s"))           // under 5 words: no shingles
      .toDF("doc_id", "text")
    val r = graft.text.TextStats.ngramNovelty(ref, score, "doc_id",
        "text", n = 5)
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(t => t._1 -> t).toMap
    r(1L) shouldBe ((1L, 1L, 0L, Some(0.0)))
    r(2L) shouldBe ((2L, 4L, 3L, Some(0.75)))
    r(3L) shouldBe ((3L, 0L, 0L, None))
    graft.util.Caches.releaseAll(spark)
  }

  "readability (X106)" should "match the hand-computed Flesch score" in {
    // "the cat sat. it ran!" -> 5 words, 2 sentences,
    // syllables: the(1) cat(1) sat.(1) it(1) ran!(1) = 5
    val df = Seq((1L, "the cat sat. it ran!"), (2L, "xyz qrt"))
      .toDF("doc_id", "text")
    val r = TextStats.readability(df, "doc_id", "text")
      .as[(Long, Long, Long, Long, Option[Double])].collect()
      .map(t => t._1 -> t).toMap
    r(1L)._2 shouldBe 5L
    r(1L)._3 shouldBe 2L
    r(1L)._4 shouldBe 5L
    val expected = 206.835 - 1.015 * (5.0 / 2) - 84.6 * (5.0 / 5)
    r(1L)._5.get shouldBe (math.rint(expected * 1000) / 1000) +- 1e-9
    // vowel-less words floor at one syllable; no terminator -> 1 sentence
    r(2L)._2 shouldBe 2L
    r(2L)._3 shouldBe 1L
    r(2L)._4 shouldBe 2L
    graft.util.Caches.releaseAll(spark)
  }

  "kneserNeyScore (X100)" should "match the hand-computed interpolated KN model" in {
    // train "a b a b a c": bigrams (a,b)=2 (b,a)=2 (a,c)=1; 3 types.
    // ctx a: c1=3 nfwd=2; ctx b: c1=2 nfwd=1. cont a/b/c: nback=1 each.
    // P(b|a) = 1.25/3 + .75·2/3·(1/3) = 0.583333…
    // P(a|a) = 0 + .5·(1/3) = 1/6 (unseen bigram, seen context)
    // P(z|z) = 1/3 floor (unseen context AND continuation)
    val train = Seq((0L, "a b a b a c")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b"), (2L, "a a"), (3L, "z z"), (4L, "a"))
      .toDF("doc_id", "text")
    val r = TextStats.kneserNeyScore(train, score, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), Option(x.get(2)).map(_.asInstanceOf[Double]))))
      .toMap
    r(1L)._1 shouldBe 1L
    r(1L)._2.get shouldBe -math.log(1.25 / 3 + 0.75 * 2 / 3.0 / 3) +- 5e-4
    r(2L)._2.get shouldBe -math.log(1.0 / 6) +- 5e-4
    r(3L)._2.get shouldBe -math.log(1.0 / 3) +- 5e-4
    r(4L) shouldBe ((0L, None)) // under 2 tokens
    graft.util.Caches.releaseAll(spark)
  }

  it should "define a probability distribution: P(·|seen ctx) sums to 1 over seen continuations" in {
    val train = Seq((0L, "a b c a b d b a c c a")).toDF("doc_id", "text")
    // vocabulary of continuations observed in training
    val vocab = Seq("a", "b", "c", "d")
    val probes = vocab.zipWithIndex.map { case (w, i) =>
      (i.toLong, s"a $w") } // context 'a' is seen
    val r = TextStats.kneserNeyScore(train, probes.toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(x => Option(x.get(2)).map(_.asInstanceOf[Double]).get)
    // each probe doc has exactly one bigram: nll = -ln P (round-3)
    val total = r.map(nll => math.exp(-nll)).sum
    total shouldBe 1.0 +- 0.01 // round-3 nll quantization only
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "containmentJoin (X96)"

  it should "find a fragment inside its article in the direction Jaccard misses" in {
    val article = (1 to 60).map(i => s"tok$i").mkString(" ")
    val fragment = (11 to 25).map(i => s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"other$i").mkString(" ")
    val df = Seq((1L, article), (2L, fragment), (3L, other))
      .toDF("doc_id", "text")
    val got = Dedup.containmentJoin(df, "doc_id", "text", 3, 0.8)
      .select(col("doc_a"), col("doc_b"), col("containment"))
      .as[(Long, Long, Double)].collect()
    got.map(r => (r._1, r._2)).toSet shouldBe Set((2L, 1L))
    got.head._3 shouldBe 1.0 // every fragment shingle is in the article
    // symmetric Jaccard at a workable threshold can't see the pair:
    // 13 shared shingles over 58+13-13 = 58 -> ~0.22
    Dedup.jaccardSimilarityJoin(df, "doc_id", "text", 3, 0.5)
      .count() shouldBe 0L
    graft.util.Caches.releaseAll(spark)
  }

  it should "respect the containment threshold per direction" in {
    // half of doc 5's shingles appear in doc 4
    val a = (1 to 12).map(i => s"w$i").mkString(" ")
    val b = ((7 to 12) ++ (50 to 55)).map(i => s"w$i").mkString(" ")
    val df = Seq((4L, a), (5L, b)).toDF("doc_id", "text")
    Dedup.containmentJoin(df, "doc_id", "text", 3, 0.8)
      .count() shouldBe 0L // ~0.4 containment both ways: below 0.8
    val loose = Dedup.containmentJoin(df, "doc_id", "text", 3, 0.3)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)]
      .collect().toSet
    loose should contain((5L, 4L))
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "pmiCollocations"

  it should "compute hand-checked lift and pmi" in {
    // unigrams: a=3 b=2 c=1, N_u=6; bigrams: "a b"=2 "a c"=1, N_b=3
    // lift(a,b) = (2/3)(6/2)(6/3) = 4; lift(a,c) = (1/3)(6/1)(6/3) = 4
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val got = TextStats.pmiCollocations(docs, "text", minCount = 1,
        topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    got.keySet shouldBe Set(("a", "b"), ("a", "c"))
    got(("a", "b"))._1 shouldBe 2L
    got(("a", "b"))._2 shouldBe 4.0 +- 1e-12
    got(("a", "c"))._2 shouldBe 4.0 +- 1e-12
    got(("a", "b"))._3 shouldBe
      BigDecimal(math.log(4.0)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    graft.util.Caches.releaseAll(spark)
  }

  it should "drop pairs below minCount and rank by lift with topK" in {
    val docs = Seq((1L, "x y x y q r"), (2L, "x y s t"),
      (3L, "u v u v u v")).toDF("doc_id", "text")
    val all = TextStats.pmiCollocations(docs, "text", minCount = 3,
        topK = 10)
      .select(col("x"), col("y")).as[(String, String)].collect().toSet
    // "x y" occurs 3x (2 in doc1 + 1 in doc2), "u v" 3x; others < 3
    all shouldBe Set(("x", "y"), ("u", "v"))
    val top1 = TextStats.pmiCollocations(docs, "text", minCount = 1,
        topK = 1)
      .select(col("lift")).as[Double].collect()
    top1.length shouldBe 1
    // the returned lift is the global maximum over all pairs
    val lifts = TextStats.pmiCollocations(docs, "text", minCount = 1,
        topK = 100)
      .select(col("lift")).as[Double].collect()
    top1.head shouldBe lifts.max
    graft.util.Caches.releaseAll(spark)
  }

  "dedupYieldReport (X122)" should "report the hand-computed size histogram and yield" in {
    // 2 identical docs (one cluster of 2) + 2 unrelated docs
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven"),
      (4L, "red orange yellow green blue indigo"))
      .toDF("doc_id", "text")
    val r = graft.text.Dedup.dedupYieldReport(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
    r.length shouldBe 1
    r.head shouldBe ((2L, 1L, 2L, 4L, 2L, 3L, 0.25))
    graft.util.Caches.releaseAll(spark)
  }

  "vocabCoverage (X120)" should "report exact cumulative shares under the (count desc, token) order" in {
    // counts: a=3, b=2, c=1 -> k=1: 3/6, k=2: 5/6, k=3: 6/6
    val docs = Seq((1L, "a a b"), (2L, "a b c")).toDF("doc_id", "text")
    val r = graft.text.TextStats.vocabCoverage(docs, "text",
        ks = Seq(1L, 2L, 3L, 10L))
      .select(col("k"), col("covered_tokens"), col("coverage"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    r.length shouldBe 3 // k=10 > #types: no row, never a wrong row
    r(0) shouldBe ((1L, 3L, 0.5))
    r(1) shouldBe ((2L, 5L, 5.0 / 6))
    r(2) shouldBe ((3L, 6L, 1.0))
    graft.util.Caches.releaseAll(spark)
  }

  "unigramDivergence (X118)" should "rank over/under-represented tokens with hand-checked smoothed probabilities" in {
    // A tokens: a,a,b (Na=3); B tokens: a,c (Nb=2); joint V=3
    // pa(b) = 1.5/4.5, pb(b) = 0.5/3.5 -> strong positive KL (over-rep
    // in A); pa(c) = 0.5/4.5, pb(c) = 1.5/3.5 -> negative KL
    val a = Seq((1L, "a a b")).toDF("doc_id", "text")
    val b = Seq((2L, "a c")).toDF("doc_id", "text")
    val r = graft.text.TextStats.unigramDivergence(a, b, "text", topK = 3)
      .select(col("token"), col("n_a"), col("n_b"), col("p_a"),
        col("kl_contrib"))
      .as[(String, Long, Long, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    r.keySet shouldBe Set("a", "b", "c")
    r("b")._2 shouldBe 1L
    r("b")._3 shouldBe 0L
    r("b")._4 shouldBe (1.5 / 4.5) +- 1e-6
    r("b")._5 should be > 0.0
    r("c")._5 should be < 0.0
    graft.util.Caches.releaseAll(spark)
  }

  it should "keep only topK contributors, deterministically under any partitioning" in {
    val rnd = new scala.util.Random(13)
    val a = (1L to 60L).map(i =>
      (i, (1 to 12).map(_ => s"w${rnd.nextInt(30)}").mkString(" ")))
      .toDF("doc_id", "text")
    val b = (1L to 60L).map(i =>
      (i, (1 to 12).map(_ => s"w${rnd.nextInt(40)}").mkString(" ")))
      .toDF("doc_id", "text")
    def run(pa: Int, pb: Int) = graft.text.TextStats
      .unigramDivergence(a.repartition(pa), b.repartition(pb), "text",
        topK = 10)
      .select(col("token"), col("kl_contrib"))
      .as[(String, Double)].collect().sortBy(_._1).toSeq
    val one = run(1, 1)
    one.length shouldBe 10
    run(7, 3) shouldBe one
    graft.util.Caches.releaseAll(spark)
  }

  "refineClusters (X116)" should "split a planted borderline member off its LSH cluster" in {
    // cluster {1, 2, 3}: 1-2 are true near-dups (J = 6/8 over
    // 3-shingles), 3 shares only a short prefix (J = 2/14 vs doc 1)
    // — the LSH-glued tail member the refinement must shed
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta kappa"),
      (3L, "alpha beta gamma delta nu xi omicron pi rho sigma tau"))
      .toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L))
      .toDF("doc_id", "cluster_id")
    val r = graft.text.Dedup.refineClusters(docs, "doc_id", "text",
        clusters, threshold = 0.5)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(t => t._1 -> ((t._3, t._4))).toMap
    r(1L) shouldBe ((1L, true))  // 1-2 verified: component min = 1
    r(2L) shouldBe ((1L, false))
    r(3L) shouldBe ((3L, true))  // split out as its own singleton
    graft.util.Caches.releaseAll(spark)
  }

  it should "verify within clusters only and fail loud on a glued mega-cluster" in {
    // identical texts in DIFFERENT clusters must not merge: the
    // refinement never adds edges across the LSH candidate structure
    val docs = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five six"),
      (3L, "one two three four five six"))
      .toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L))
      .toDF("doc_id", "cluster_id")
    val r = graft.text.Dedup.refineClusters(docs, "doc_id", "text",
        clusters)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(t => t._1 -> t._3).toMap
    r(1L) shouldBe 1L
    r(2L) shouldBe 1L
    r(3L) shouldBe 3L // identical text, but out of candidate scope
    val mega = (1L to 20L).map(i => (i, 5L)).toDF("doc_id", "cluster_id")
    val ex = intercept[IllegalArgumentException] {
      graft.text.Dedup.refineClusters(docs, "doc_id", "text", mega,
        maxClusterSize = 10)
    }
    ex.getMessage should include("mega-cluster")
    graft.util.Caches.releaseAll(spark)
  }

  it should "keep exact X17 duplicates together through refinement (identity on true clusters)" in {
    // every member is a genuine near-dup: refinement must be a no-op
    val docs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (11L, "the quick brown fox jumps over the lazy dog tonight"),
      (12L, "the quick brown fox jumps over the lazy dog again"))
      .toDF("doc_id", "text")
    val clusters = graft.text.Dedup.nearDuplicateClusters(docs,
      "doc_id", "text")
    val refined = graft.text.Dedup.refineClusters(docs, "doc_id",
        "text", clusters, threshold = 0.5)
      .as[(Long, Long, Long, Boolean)].collect()
    refined.foreach { t => t._3 shouldBe t._2 } // refined == original
    graft.util.Caches.releaseAll(spark)
  }

  "tfidfTopTerms (X128)" should "rank hand-computed weights with a token tie-break" in {
    import spark.implicits._
    // N=2. doc1: "rare rare common", doc2: "common other"
    // df: rare=1, common=2, other=1
    // doc1 rare: (1+ln2)*ln(3/2); doc1 common: (1+ln1)*ln(3/3)=0
    val docs = Seq((1L, "rare rare common"), (2L, "common other"))
      .toDF("doc_id", "text")
    val r = graft.text.TextStats.tfidfTopTerms(docs, "doc_id", "text",
        k = 2)
      .as[(Long, String, Long, Long, Double, Long)].collect()
      .map(t => (t._1, t._6) -> t).toMap
    val w1 = (1.0 + math.log(2.0)) * math.log(3.0 / 2.0)
    r((1L, 1L))._2 shouldBe "rare"
    r((1L, 1L))._5 shouldBe w1 +- 1e-12
    r((1L, 2L))._2 shouldBe "common"
    r((1L, 2L))._5 shouldBe 0.0
    // doc2: common (w=0) and other (w=ln(3/2)) -> other ranks first
    r((2L, 1L))._2 shouldBe "other"
    r((2L, 2L))._2 shouldBe "common"
    graft.util.Caches.releaseAll(spark)
  }

  "distinctNgramReport (X131)" should "count hand-checked totals, distincts and drop short-doc orders" in {
    import spark.implicits._
    // src a: "x x x" -> 1-grams 3 total 1 distinct; 2-grams "x x" x2
    // -> 2 total 1 distinct; 3-grams 1 total 1 distinct
    // src b: "p q" -> 1-grams 2/2; 2-grams 1/1; NO 3-grams (short doc)
    val docs = Seq(("a", "x x x"), ("b", "p q")).toDF("source", "text")
    val r = graft.text.TextStats.distinctNgramReport(docs, "source",
        "text", Seq(1, 2, 3))
      .as[(String, Int, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t).toMap
    r(("a", 1)) shouldBe (("a", 1, 3L, 1L, 1.0 / 3))
    r(("a", 2)) shouldBe (("a", 2, 2L, 1L, 0.5))
    r(("a", 3)) shouldBe (("a", 3, 1L, 1L, 1.0))
    r(("b", 1)) shouldBe (("b", 1, 2L, 2L, 1.0))
    r.contains(("b", 3)) shouldBe false // no row, not 0/0
    graft.util.Caches.releaseAll(spark)
  }

  "sourceOverlapMatrix (X132)" should "compute hand-checked pairwise distinct-gram Jaccard" in {
    import spark.implicits._
    // 2-grams: a = {p q, q r}, b = {q r, r s}, c = {z z}
    // a∩b = {q r} -> jaccard 1/3; c shares nothing -> no rows
    val docs = Seq(("a", "p q r"), ("b", "q r s"), ("c", "z z"))
      .toDF("source", "text")
    val r = graft.text.TextStats.sourceOverlapMatrix(docs, "source",
        "text", shingleN = 2)
      .as[(String, String, Long, Long, Long, Double)].collect()
    r.length shouldBe 1
    r.head shouldBe (("a", "b", 2L, 2L, 1L, 1.0 / 3))
    graft.util.Caches.releaseAll(spark)
  }

  "dataCard (X133)" should "publish hand-checked headline metrics" in {
    import spark.implicits._
    val docs = Seq((1L, "a b c", "s1", "en"), (2L, "a b c", "s1", "de"),
      (3L, "x y", "s2", "en")).toDF("doc_id", "text", "source", "lang")
    val m = graft.text.TextStats.dataCard(docs, "doc_id", "text",
        "source", "lang")
      .as[(String, Double)].collect().toMap
    m("n_docs") shouldBe 3.0
    m("n_sources") shouldBe 2.0
    m("n_langs") shouldBe 2.0
    m("total_tokens") shouldBe 8.0
    m("total_chars") shouldBe 13.0
    m("exact_dup_docs") shouldBe 2.0 // the two identical texts
    m("exact_dup_rate") shouldBe 2.0 / 3 +- 1e-15
    graft.util.Caches.releaseAll(spark)
  }

  "tokenizerFertility (X135)" should "compute exact per-language ratios" in {
    import spark.implicits._
    // en: "ab cd" -> 2 words, 2 bpe tokens, 5 chars
    // de: "a-b" -> 1 word, 3 bpe tokens (a, -, b), 3 chars
    val docs = Seq(("en", "ab cd"), ("de", "a-b")).toDF("lang", "text")
    val r = graft.text.TextStats.tokenizerFertility(docs, "lang",
        "text")
      .as[(String, Long, Long, Long, Long, Option[Double],
        Option[Double])].collect().map(t => t._1 -> t).toMap
    r("en") shouldBe (("en", 1L, 2L, 2L, 5L, Some(1.0), Some(2.5)))
    r("de")._4 shouldBe 3L
    r("de")._6 shouldBe Some(3.0)
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "TextStats.bleuPairs"

  it should "clip repeated grams (the Papineni 'the the the' case) and score identity as 1" in {
    val df = Seq(
      (1L, "the the the the the the the", "the cat is on the mat"),
      (2L, "the cat is on the mat", "the cat is on the mat"),
      (3L, "completely different words here", "the cat is on the mat"))
      .toDF("id", "cand", "ref")
    val r = graft.text.TextStats.bleuPairs(df, col("id"), col("cand"),
      col("ref"), maxN = 2).orderBy(col("key"))
      .select("key", "c_len", "r_len", "p_1", "p_2", "bp", "bleu")
      .as[(Long, Long, Long, Option[Double], Option[Double],
        Option[Double], Double)].collect()
    // pair 1: 'the' appears 2x in the reference -> clipped p1 = 2/7;
    // no candidate bigram matches -> p2 = 0 -> bleu 0
    r(0)._4.get shouldBe math.floor(2.0 / 7 * 1e6 + 0.5) / 1e6
    r(0)._5.get shouldBe 0.0
    r(0)._7 shouldBe 0.0
    // pair 2: identical -> p1 = p2 = bp = bleu = 1
    r(1)._4.get shouldBe 1.0
    r(1)._5.get shouldBe 1.0
    r(1)._6.get shouldBe 1.0
    r(1)._7 shouldBe 1.0
    // pair 3: zero overlap -> bleu 0 but lengths still reported
    r(2)._2 shouldBe 4L; r(2)._3 shouldBe 6L; r(2)._7 shouldBe 0.0
  }

  behavior of "TextStats.rougePairs"

  it should "score hand-computed recall/precision/F1 at both orders" in {
    val df = Seq(
      (1L, "the cat sat", "the cat is on the mat"),
      (2L, "the cat is on the mat", "the cat is on the mat"))
      .toDF("id", "cand", "ref")
    val r = graft.text.TextStats.rougePairs(df, col("id"), col("cand"),
      col("ref")).orderBy(col("key"))
      .select("rouge1_overlap", "rouge1_r", "rouge1_p", "rouge1_f",
        "rouge2_overlap", "rouge2_r", "rouge2_p", "rouge2_f")
      .as[(Long, Double, Double, Double, Long, Double, Double, Double)]
      .collect()
    // pair 1 unigrams: overlap {the:1, cat:1} = 2 of ref-6 / cand-3
    r(0)._1 shouldBe 2L
    r(0)._2 shouldBe 2.0 / 6 +- 1e-15
    r(0)._3 shouldBe 2.0 / 3 +- 1e-15
    r(0)._4 shouldBe 4.0 / 9 +- 1e-15
    // pair 1 bigrams: only 'the cat' matches, ref has 5, cand has 2
    r(0)._5 shouldBe 1L
    r(0)._6 shouldBe 0.2 +- 1e-15
    r(0)._7 shouldBe 0.5 +- 1e-15
    r(0)._8 shouldBe 2.0 / 7 +- 1e-15
    // identity scores 1 everywhere
    r(1) shouldBe ((6L, 1.0, 1.0, 1.0, 5L, 1.0, 1.0, 1.0))
  }

  it should "apply the brevity penalty exactly" in {
    // cand = first 3 words of the 6-word ref: p1 = 1, p2 = 1,
    // bp = e^(1 - 6/3) = e^-1
    val df = Seq((1L, "the cat is", "the cat is on the mat"))
      .toDF("id", "cand", "ref")
    val r = graft.text.TextStats.bleuPairs(df, col("id"), col("cand"),
      col("ref"), maxN = 2)
      .select("bp", "bleu").as[(Double, Double)].head()
    r._1 shouldBe math.floor(math.exp(-1.0) * 1e6 + 0.5) / 1e6
    r._2 shouldBe math.floor(math.exp(-1.0) * 1e6 + 0.5) / 1e6
  }
}
