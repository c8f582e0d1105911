package graft

import org.apache.spark.sql.functions._

class LofSpec extends SparkSpec {
  import spark.implicits._

  behavior of "Similarity.lofScores (X165)"

  it should "score a planted outlier far above the inlier cluster, tie-inclusively" in {
    // 1-D points 0, 1, 2, 10 with k = 1: point 1 has BOTH 0 and 2 at
    // distance 1 (tie-inclusive neighborhood of 2); point 10 is the
    // density outlier
    val pts = Seq(0L -> 0.0, 1L -> 1.0, 2L -> 2.0, 3L -> 10.0)
      .map { case (id, x) => (id, Array(x)) }.toDF("id", "vec")
    val r = graft.ann.Similarity.lofScores(pts, "id", "vec", k = 1)
      .as[(Long, Double, Long, Option[Double], Option[Double])]
      .collect().map(t => t._1 -> t).toMap
    r(1L)._3 shouldBe 2L // tie-inclusive: both unit-distance neighbors
    r(0L)._2 shouldBe 1.0 // k-distance of the edge inlier
    r(3L)._2 shouldBe 8.0 // outlier's nearest neighbor is point 2
    // inliers sit near density 1; the outlier's neighborhood is ~8x
    // sparser than its neighbor's
    r(1L)._5.get should be < 1.2
    r(3L)._5.get should be > 4.0
    r(3L)._5.get should be > r(0L)._5.get
    graft.util.Caches.releaseAll(spark)
  }

  it should "emit NULL lrd/lof for infinite-density duplicate clusters, never a division error" in {
    // k+1 exact duplicates: k-distance 0, all reach-dists 0
    val pts = Seq.tabulate(4)(i => (i.toLong, Array(5.0, 5.0)))
      .toDF("id", "vec")
    val r = graft.ann.Similarity.lofScores(pts, "id", "vec", k = 2)
      .as[(Long, Double, Long, Option[Double], Option[Double])]
      .collect()
    r.length shouldBe 4
    all(r.map(_._2)) shouldBe 0.0 // k-dist 0
    all(r.map(_._4)) shouldBe None // infinite density
    all(r.map(_._5)) shouldBe None
    graft.util.Caches.releaseAll(spark)
  }

  it should "be partition-invariant and fail loud past maxPoints" in {
    val pts = (1L to 30L).map(i =>
      (i, Array((i % 7).toDouble, (i % 11).toDouble))).toDF("id", "vec")
    def run(parts: Int) = graft.ann.Similarity
      .lofScores(pts.repartition(parts), "id", "vec", k = 3)
      .as[(Long, Double, Long, Option[Double], Option[Double])]
      .collect().toSeq
    run(2) shouldBe run(5)
    intercept[IllegalArgumentException] {
      graft.ann.Similarity.lofScores(pts, "id", "vec", k = 3,
        maxPoints = 10L)
    }
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Similarity.lofScoresBucketed (X179)"

  // two direction clusters: x-axis points bucket to centroid 100,
  // y-axis points to 200; ids 7/8 sit on the diagonal, 0.28 apart,
  // split across the buckets by their slightly different directions
  private def boundaryFixture = (Seq(
    1L -> Array(10.0, 0.0), 2L -> Array(11.0, 0.0),
    3L -> Array(12.0, 0.0), 8L -> Array(7.2, 7.0),
    4L -> Array(0.0, 10.0), 5L -> Array(0.0, 11.0),
    6L -> Array(0.0, 12.0), 7L -> Array(7.0, 7.2))
    .toDF("id", "vec"),
    Seq(100L -> Array(1.0, 0.0), 200L -> Array(0.0, 1.0))
      .toDF("id", "vec"))

  it should "reproduce exact LOF within each bucket" in {
    val (pts, cents) = boundaryFixture
    val bucketed = graft.ann.Similarity.lofScoresBucketed(
      pts, "id", "vec", cents, dim = 2, k = 1)
      .as[(Long, Long, Double, Long, Option[Double], Option[Double])]
      .collect()
    bucketed.filter(_._2 == 100L).map(_._1).sorted shouldBe
      Array(1L, 2L, 3L, 8L)
    bucketed.filter(_._2 == 200L).map(_._1).sorted shouldBe
      Array(4L, 5L, 6L, 7L)
    // the bucket-local scores ARE the exact LOF of the bucket alone —
    // the kernel is shared, only pair generation changes
    for (b <- Seq(Seq(1L, 2L, 3L, 8L), Seq(4L, 5L, 6L, 7L))) {
      val exact = graft.ann.Similarity.lofScores(
        pts.filter(col("id").isin(b: _*)), "id", "vec", k = 1)
        .as[(Long, Double, Long, Option[Double], Option[Double])]
        .collect().map(t => t._1 -> t).toMap
      bucketed.filter(r => b.contains(r._1)).foreach { r =>
        (r._3, r._4, r._5, r._6) shouldBe
          (exact(r._1)._2, exact(r._1)._3, exact(r._1)._4, exact(r._1)._5)
      }
    }
    graft.util.Caches.releaseAll(spark)
  }

  it should "exhibit the documented bucket-boundary caveat and guard bucket size" in {
    val (pts, cents) = boundaryFixture
    val bucketed = graft.ann.Similarity.lofScoresBucketed(
      pts, "id", "vec", cents, dim = 2, k = 1)
      .as[(Long, Long, Double, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val exact = graft.ann.Similarity.lofScores(pts, "id", "vec", k = 1)
      .as[(Long, Double, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    // ids 7 and 8 are each other's TRUE nearest neighbor (0.28 apart)
    // but land in different buckets: the bucket-local k-distance is
    // strictly coarser — the caveat the scaladoc states
    exact(7L)._2 should be < 1.0
    bucketed(7L)._3 should be > 5.0
    bucketed(8L)._3 should be > 5.0
    // and NEVER finer: a bucket can only hide neighbors, not add them
    pts.select("id").as[Long].collect().foreach { id =>
      bucketed(id)._3 should be >= exact(id)._2
    }
    intercept[IllegalArgumentException] {
      graft.ann.Similarity.lofScoresBucketed(pts, "id", "vec", cents,
        dim = 2, k = 1, maxBucketPoints = 3L)
    }
    graft.util.Caches.releaseAll(spark)
  }

  behavior of "Similarity.lofScoresHalo (X181)"

  it should "close the bucket-boundary caveat: equal exact LOF on the split-pair fixture" in {
    // the fixture that PINS the X179 caveat: ids 7/8 are true nearest
    // neighbors 0.28 apart but land in different primary cells. With
    // probes = 2 every point also visits its runner-up cell, the pair
    // relation becomes the full relation here, and the halo scores
    // equal the exact all-pairs LOF — k-dist, |N|, lrd and lof alike
    val (pts, cents) = boundaryFixture
    val halo = graft.ann.Similarity.lofScoresHalo(
      pts, "id", "vec", cents, dim = 2, k = 1, probes = 2)
      .as[(Long, Long, Double, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val exact = graft.ann.Similarity.lofScores(pts, "id", "vec", k = 1)
      .as[(Long, Double, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    halo.keySet shouldBe exact.keySet
    exact.foreach { case (id, e) =>
      (halo(id)._3, halo(id)._4, halo(id)._5, halo(id)._6) shouldBe
        (e._2, e._3, e._4, e._5)
    }
    // primary-cell reporting is unchanged from the bucketed form
    halo(7L)._2 shouldBe 200L
    halo(8L)._2 shouldBe 100L
    graft.util.Caches.releaseAll(spark)
  }

  it should "never widen a k-distance vs the bucketed form and guard the halo cell size" in {
    // the halo pair relation is a SUPERSET of the bucketed one (same-
    // primary pairs share their probe-0 cell), so k-dist can only
    // shrink or stay — on any fixture, not just the planted one
    val pts = (1L to 40L).map(i => (i,
      Array((i % 9).toDouble, (i % 7).toDouble, (i % 5).toDouble)))
      .toDF("id", "vec")
    val cents = Seq(
      100L -> Array(1.0, 0.0, 0.0), 200L -> Array(0.0, 1.0, 0.0),
      300L -> Array(0.0, 0.0, 1.0), 400L -> Array(1.0, 1.0, 1.0))
      .toDF("id", "vec")
    val bucketed = graft.ann.Similarity.lofScoresBucketed(
      pts, "id", "vec", cents, dim = 3, k = 3)
      .as[(Long, Long, Double, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r._3).toMap
    val halo = graft.ann.Similarity.lofScoresHalo(
      pts, "id", "vec", cents, dim = 3, k = 3, probes = 2)
      .as[(Long, Long, Double, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r._3).toMap
    bucketed.keySet.subsetOf(halo.keySet) shouldBe true
    bucketed.foreach { case (id, kd) => halo(id) should be <= kd }
    // partition invariance (the candidate dedup and kernel are
    // shuffle-order-free)
    val again = graft.ann.Similarity.lofScoresHalo(
      pts.repartition(13), "id", "vec", cents, dim = 3, k = 3,
      probes = 2)
      .as[(Long, Long, Double, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r._3).toMap
    again shouldBe halo
    // the census counts HALO rows too: probes = 2 doubles occupancy
    intercept[IllegalArgumentException] {
      graft.ann.Similarity.lofScoresHalo(pts, "id", "vec", cents,
        dim = 3, k = 3, probes = 2, maxBucketPoints = 10L)
    }
    graft.util.Caches.releaseAll(spark)
  }
}
