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

  it should "count whitespace and BPE-ish tokens" in {
    val (nTok, nBpe) = TextStats.tokenCounts(lit("ab 12 cd!"))
    val r = docs.limit(1).select(nTok.as("a"), nBpe.as("b"))
      .as[(Long, Long)].head()
    r shouldBe ((3L, 4L)) // ab|12|cd|! as subword tokens
  }
}
