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
}
