package graft

import org.apache.spark.sql.functions._

class WeightedDedupAlphaSpec extends SparkSpec {
  import spark.implicits._

  behavior of "Labeling.krippendorffAlpha and Dedup.weightedMinhashNearDuplicates"

  it should "match the hand-computed nominal alpha with missing votes" in {
    // u1: a,a (term 0); u2: a,b (term 2); u3: b,b,b (term 0);
    // u4: single vote -> excluded. n = 7, label totals a=3 b=4,
    // D_o = 2/7, D_e = (49-25)/42 = 4/7, alpha = 1 - 1/2 = 0.5
    val votes = Seq(
      (1, "A", "a"), (1, "B", "a"),
      (2, "A", "a"), (2, "B", "b"),
      (3, "A", "b"), (3, "B", "b"), (3, "C", "b"),
      (4, "A", "a")).toDF("item", "rater", "label")
    val r = graft.ml.Labeling.krippendorffAlpha(votes,
        col("item"), col("rater"), col("label"))
      .as[(Long, Long, Double, Double, Double)].collect().head
    r._1 shouldBe 3L
    r._2 shouldBe 7L
    r._3 shouldBe 0.285714 +- 1e-9
    r._4 shouldBe 0.571429 +- 1e-9
    r._5 shouldBe 0.5 +- 1e-9
  }

  it should "yield alpha 1 on perfect agreement and NULL when D_e is 0" in {
    val perfect = Seq((1, "A", "x"), (1, "B", "x"), (2, "A", "y"),
      (2, "B", "y")).toDF("item", "rater", "label")
    val rp = graft.ml.Labeling.krippendorffAlpha(perfect,
        col("item"), col("rater"), col("label"))
      .select(col("alpha")).as[Double].collect().head
    rp shouldBe 1.0 +- 1e-9
    // one single label everywhere -> D_e = 0 -> alpha NULL (not 1):
    // agreement with zero label variety carries no evidence
    val constant = Seq((1, "A", "x"), (1, "B", "x"))
      .toDF("item", "rater", "label")
    val rc = graft.ml.Labeling.krippendorffAlpha(constant,
        col("item"), col("rater"), col("label"))
      .select(col("alpha")).as[Option[Double]].collect().head
    rc shouldBe None
  }

  it should "treat the weighted signature as a multiset invariant" in {
    // same multiset, different order -> identical signatures -> full match
    val docs = Seq(
      (1L, "alpha beta beta gamma gamma gamma"),
      (2L, "gamma beta gamma alpha gamma beta")).toDF("doc_id", "text")
    // shingleN = 1: the pure token-multiset semantics this property is
    // about (n-gram shingles are order-sensitive by design)
    val pairs = graft.text.Dedup.weightedMinhashNearDuplicates(
      docs, "doc_id", "text", shingleN = 1, k = 16, bands = 4,
      minMatch = 1)
      .as[(Long, Long, Long, Double)].collect()
    pairs.length shouldBe 1
    pairs.head._3 shouldBe 16L
    pairs.head._4 shouldBe 1.0
  }

  it should "separate repetition structure that set-Jaccard saturates on" in {
    // B = A ++ A: set-Jaccard 1, weighted Jaccard L/2L = 0.5 — the
    // estimate (k = 64 lanes) must sit clearly below full agreement
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base + " " + base))
      .toDF("doc_id", "text")
    // 1-row bands: at J_w ≈ 0.5 a 16-row band almost never fully
    // agrees (0.5^16), so production banding correctly prunes the pair
    // — the estimator check needs every candidate, not the LSH gate
    val pairs = graft.text.Dedup.weightedMinhashNearDuplicates(
      docs, "doc_id", "text", k = 64, bands = 64, minMatch = 1)
      .as[(Long, Long, Long, Double)].collect()
    pairs.length shouldBe 1
    val est = pairs.head._4
    est should be >= 0.25
    est should be <= 0.75
  }

  it should "collapse to set semantics when maxTf = 1" in {
    val docs = Seq((1L, "aa aa aa bb"), (2L, "aa bb"))
      .toDF("doc_id", "text")
    val pairs = graft.text.Dedup.weightedMinhashNearDuplicates(
      docs, "doc_id", "text", shingleN = 1, k = 16, bands = 4,
      minMatch = 1, maxTf = 1)
      .as[(Long, Long, Long, Double)].collect()
    pairs.length shouldBe 1
    pairs.head._3 shouldBe 16L // identical token SETS -> identical sigs
  }
}
