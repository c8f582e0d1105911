package graft

import org.apache.spark.sql.functions._

class DeLongSpec extends SparkSpec {
  import spark.implicits._

  behavior of "Eval.deLongTest"

  private def run(rows: Seq[(Long, Double, Double, Int)]) =
    graft.ml.Eval.deLongTest(
      rows.toDF("id", "sa", "sb", "y"),
      col("id"), col("sa"), col("sb"), col("y"))
      .as[(Long, Long, Double, Double, Double, Option[Double],
        Option[Double])].collect().head

  /** Brute-force reference: placements over explicit pairs, sample
    * covariances, the published variance formula. */
  private def reference(rows: Seq[(Long, Double, Double, Int)])
      : (Double, Double, Double) = {
    val pos = rows.filter(_._4 == 1)
    val neg = rows.filter(_._4 == 0)
    val m = pos.size.toDouble
    val n = neg.size.toDouble
    def psi(a: Double, b: Double) =
      if (a > b) 1.0 else if (a == b) 0.5 else 0.0
    def v10(s: ((Long, Double, Double, Int)) => Double) =
      pos.map(p => neg.map(q => psi(s(p), s(q))).sum / n)
    def v01(s: ((Long, Double, Double, Int)) => Double) =
      neg.map(q => pos.map(p => psi(s(p), s(q))).sum / m)
    val (va10, vb10) = (v10(_._2), v10(_._3))
    val (va01, vb01) = (v01(_._2), v01(_._3))
    val aucA = va10.sum / m
    val aucB = vb10.sum / m
    def cov(x: Seq[Double], y: Seq[Double]) = {
      val k = x.size.toDouble
      (x.zip(y).map { case (a, b) => a * b }.sum -
        x.sum * y.sum / k) / (k - 1)
    }
    val v = (cov(va10, va10) + cov(vb10, vb10) - 2 * cov(va10, vb10)) / m +
      (cov(va01, va01) + cov(vb01, vb01) - 2 * cov(va01, vb01)) / n
    (aucA, aucB, v)
  }

  it should "match a brute-force pair computation with ties" in {
    val rows = Seq(
      (1L, 9.0, 8.0, 1), (2L, 7.0, 9.0, 1), (3L, 5.0, 5.0, 1),
      (4L, 8.0, 4.0, 0), (5L, 5.0, 6.0, 0), (6L, 2.0, 2.0, 0),
      (7L, 1.0, 7.0, 0))
    val got = run(rows)
    val (aucA, aucB, v) = reference(rows)
    got._1 shouldBe 3L
    got._2 shouldBe 4L
    got._3 shouldBe aucA +- 1e-12
    got._4 shouldBe aucB +- 1e-12
    got._5 shouldBe (aucA - aucB) +- 1e-12
    got._6.get shouldBe v +- 1e-12
    got._7.get shouldBe ((aucA - aucB) / math.sqrt(v)) +- 1e-9
  }

  it should "report zero delta and NULL z for identical rankers" in {
    val rows = Seq((1L, 3.0, 3.0, 1), (2L, 4.0, 4.0, 1),
      (3L, 1.0, 1.0, 0), (4L, 2.0, 2.0, 0))
    val got = run(rows)
    got._3 shouldBe 1.0
    got._5 shouldBe 0.0
    got._6.get shouldBe 0.0
    got._7 shouldBe None // var = 0 -> no z, never a division by zero
  }

  it should "be invariant under input partitioning" in {
    val rows = (1L to 60L).map(i =>
      (i, (i * 13 % 29).toDouble + (if (i % 4 == 0) 9 else 0),
        (i * 7 % 31).toDouble + (if (i % 4 == 0) 6 else 0),
        if (i % 4 == 0) 1 else 0))
    val a = run(rows)
    val b = graft.ml.Eval.deLongTest(
      rows.toDF("id", "sa", "sb", "y").repartition(13),
      col("id"), col("sa"), col("sb"), col("y"))
      .as[(Long, Long, Double, Double, Double, Option[Double],
        Option[Double])].collect().head
    b shouldBe a
  }

  it should "return NULL variance when a class has fewer than 2 members" in {
    val got = run(Seq((1L, 3.0, 2.0, 1), (2L, 1.0, 1.0, 0),
      (3L, 0.5, 2.0, 0)))
    got._6 shouldBe None
    got._7 shouldBe None
  }
}
