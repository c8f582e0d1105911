package graft

import graft.ml.Pca
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val d = 8

  // deterministic data concentrated on a planted 2-D subspace
  private def planted(n: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(5)
    val u = Array.tabulate(d)(i => if (i % 2 == 0) 0.5 else -0.5)
    val v = Array.tabulate(d)(i => if (i < 4) 0.5 else 0.5) // overlapping
    (0 until n).map { i =>
      val a = rnd.nextGaussian() * 3.0
      val b = rnd.nextGaussian() * 1.5
      val x = Array.tabulate(d)(k =>
        (a * u(k) + b * v(k) + rnd.nextGaussian() * 0.01).toFloat)
      (i.toLong, x.toSeq)
    }
  }

  it should "reproduce the naive covariance and be partition-invariant" in {
    val data = planted(300)
    val df = data.toDF("id", "vec")
    val got = Pca.covarianceMatrix(df.repartition(7), "vec", d)
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val got1 = Pca.covarianceMatrix(df.repartition(1), "vec", d)
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // naive driver-side covariance
    val n = data.size.toDouble
    val xs = data.map(_._2.map(_.toDouble).toArray)
    val mean = (0 until d).map(i => xs.map(_(i)).sum / n)
    for (i <- 0 until d; j <- i until d) {
      val naive = xs.map(x => x(i) * x(j)).sum / n - mean(i) * mean(j)
      got((i.toLong, j.toLong)) shouldBe naive +- 1e-9
      got1((i.toLong, j.toLong)) shouldBe got((i.toLong, j.toLong)) +- 1e-12
    }
  }

  it should "recover the planted 2-D subspace with orthonormal components" in {
    val df = planted(500).toDF("id", "vec")
    val m = Pca.fit(df, "vec", d, k = 3)
    // eigenvalues sorted descending; top-2 dominate the noise floor
    m.eigenvalues(0) should be >= m.eigenvalues(1)
    m.eigenvalues(1) should be >= m.eigenvalues(2)
    m.eigenvalues(1) should be > 100 * m.eigenvalues(2)
    // orthonormal rows
    for (a <- m.components.indices; b <- a until m.components.size) {
      val dot = m.components(a).zip(m.components(b)).map(t => t._1 * t._2).sum
      dot shouldBe (if (a == b) 1.0 else 0.0) +- 1e-9
    }
    // projected variance per component equals its eigenvalue
    val proj = Pca.project(df, "id", "vec", m)
      .select(col("id"), col("projected"))
      .as[(Long, Seq[Double])].collect()
    for (c <- 0 until 3) {
      val vals = proj.map(_._2(c))
      val mu = vals.sum / vals.length
      val variance = vals.map(x => (x - mu) * (x - mu)).sum / vals.length
      variance shouldBe m.eigenvalues(c) +- 1e-6 * math.max(1.0, m.eigenvalues(c))
    }
  }

  it should "pin component signs so refits are reproducible" in {
    val df = planted(200).toDF("id", "vec")
    val m1 = Pca.fit(df.repartition(3), "vec", d, k = 2)
    val m2 = Pca.fit(df.repartition(5), "vec", d, k = 2)
    for (c <- 0 until 2; i <- 0 until d)
      m1.components(c)(i) shouldBe m2.components(c)(i) +- 1e-9
    m1.components.foreach { comp =>
      comp(comp.indices.maxBy(i => math.abs(comp(i)))) should be > 0.0
    }
  }
}
