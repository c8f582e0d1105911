package graft.ml

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** X102: PCA over an embedding column — covariance via ONE custom typed
  * aggregate, eigendecomposition on the (model-sized) matrix, and a
  * broadcast projection. The embedding-pipeline use: decorrelate /
  * whiten vectors before quantization (PQ codebooks assume isotropy)
  * and cut storage with a principled, variance-ranked dim reduction
  * (the ablation q_x95 measures; this supplies the rotation it lacks).
  *
  * Scale design: the moment pass is an [[Aggregator]] whose buffer is
  * `1 + d + d(d+1)/2` doubles (n, per-dim sums, upper-triangular
  * products) — ~17 KB at d = 64 — merged map-side like any partial
  * aggregate; the corpus is scanned ONCE and only matrix-sized state
  * crosses the shuffle. The naive encoding (explode to (row, i, x) and
  * self-join on row id) shuffles n·d² rows and is exactly what this
  * module exists to avoid. The eigensolve touches d×d numbers on the
  * driver (documented model-sized contract, like the PQ codebooks);
  * the projection broadcasts k·d doubles. */
object Pca {

  /** Typed moment aggregate. Vectors of the wrong length or NULL are
    * skipped (counted out of n). */
  private final class MomentAgg(d: Int)
      extends Aggregator[Seq[Float], Array[Double], Array[Double]] {
    private val off = 1 + d
    def zero: Array[Double] = new Array[Double](1 + d + d * (d + 1) / 2)
    def reduce(b: Array[Double], v: Seq[Float]): Array[Double] = {
      if (v != null && v.length == d) {
        b(0) += 1.0
        val x = new Array[Double](d)
        var i = 0
        while (i < d) { x(i) = v(i).toDouble; b(1 + i) += x(i); i += 1 }
        var k = off
        i = 0
        while (i < d) {
          var j = i
          while (j < d) { b(k) += x(i) * x(j); j += 1; k += 1 }
          i += 1
        }
      }
      b
    }
    def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Double]): Array[Double] = b
    def bufferEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
    def outputEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
  }

  /** Population covariance matrix of a fixed-`dim` vector column, as
    * upper-triangular rows (i ≤ j): (i, j, cov). One corpus scan. */
  def covarianceMatrix(df: DataFrame, vecCol: String, dim: Int)
      : DataFrame =
    covarianceFromBuffer(df.sparkSession,
      momentBuffer(df, vecCol, dim), dim)

  /** Covariance rows from a (possibly merged) moment buffer — the
    * moment sums are associative, so buffers from independent batches
    * sum elementwise into exactly the one-pass buffer of their union
    * (what the streaming moment sink relies on). */
  private[graft] def covarianceFromBuffer(spark: SparkSession,
      buf: Array[Double], dim: Int): DataFrame = {
    require(buf(0) > 0, "covariance needs at least one valid vector")
    val rows = for {
      i <- 0 until dim; j <- i until dim
    } yield (i.toLong, j.toLong, cov(buf, dim, i, j))
    import spark.implicits._
    rows.toDF("i", "j", "cov")
  }

  private[graft] def momentBuffer(df: DataFrame, vecCol: String,
      dim: Int): Array[Double] = {
    val spark = df.sparkSession
    implicit val enc: Encoder[Seq[Float]] = ExpressionEncoder[Seq[Float]]()
    df.select(col(vecCol)).as[Seq[Float]]
      .select(new MomentAgg(dim).toColumn).head()
  }

  private def cov(b: Array[Double], d: Int, i: Int, j: Int): Double = {
    val n = b(0)
    val off = 1 + d
    // upper-tri index of (i, j), i <= j
    val k = off + i * d - i * (i - 1) / 2 + (j - i)
    b(k) / n - (b(1 + i) / n) * (b(1 + j) / n)
  }

  /** Fitted rotation: `components(c)(i)` = loading of input dim i on
    * component c (rows orthonormal, eigenvalue-descending, sign pinned
    * so each row's largest-|·| entry is positive — eigenvectors are
    * sign-ambiguous and an unpinned sign would make re-fits
    * irreproducible). `eigenvalues` = per-component variance. */
  final case class PcaModel(mean: Array[Double],
      components: Array[Array[Double]], eigenvalues: Array[Double])

  /** Fit top-`k` principal components: one distributed moment pass +
    * a driver-side cyclic Jacobi eigensolve of the d×d covariance
    * (deterministic: fixed sweep order, fixed tolerance). */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int): PcaModel = {
    require(k >= 1 && k <= dim, s"k must be in [1, $dim], got $k")
    val buf = momentBuffer(df, vecCol, dim)
    val mean = (0 until dim).map(i => buf(1 + i) / buf(0)).toArray
    val a = Array.tabulate(dim, dim) { (i, j) =>
      if (i <= j) cov(buf, dim, i, j) else cov(buf, dim, j, i) }
    val (values, vectors) = jacobiEigen(a)
    val order = values.zipWithIndex.sortBy(-_._1).map(_._2).take(k)
    val comps = order.map { c =>
      val v = vectors.map(_(c))
      // pin sign: largest-|entry| positive
      val m = v.indices.maxBy(i => math.abs(v(i)))
      if (v(m) < 0) v.map(x => -x) else v
    }
    PcaModel(mean, comps, order.map(values))
  }

  /** Project vectors onto the fitted components (mean-centered):
    * output (idCol, projected: array<double> of length k). The model
    * rides the closure as a broadcast-sized constant. */
  def project(df: DataFrame, idCol: String, vecCol: String,
      model: PcaModel): DataFrame = {
    val comps = model.components
    val mean = model.mean
    val proj = udf { v: Seq[Float] =>
      if (v == null || v.length != mean.length) null
      else {
        val x = Array.tabulate(mean.length)(i => v(i).toDouble - mean(i))
        comps.map { c =>
          var s = 0.0
          var i = 0
          while (i < x.length) { s += c(i) * x(i); i += 1 }
          s
        }
      }
    }
    df.select(col(idCol), proj(col(vecCol)).as("projected"))
  }

  /** Cyclic Jacobi for a symmetric matrix: returns (eigenvalues,
    * eigenvector matrix V with columns as eigenvectors). O(d³) per
    * sweep, ≤ 64 sweeps, tolerance 1e-12 on the off-diagonal norm —
    * deterministic for a given input. */
  private[ml] def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offNorm(a)
    while (off > 1e-12 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-15) rotate(a, v, p, q)
          q += 1
        }
        p += 1
      }
      off = offNorm(a)
      sweep += 1
    }
    ((0 until d).map(i => a(i)(i)).toArray, v)
  }

  private def offNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  private def rotate(a: Array[Array[Double]], v: Array[Array[Double]],
      p: Int, q: Int): Unit = {
    val d = a.length
    val apq = a(p)(q)
    val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
    val t = {
      val s = if (theta >= 0) 1.0 else -1.0
      s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
    }
    val c = 1.0 / math.sqrt(t * t + 1.0)
    val s = t * c
    var i = 0
    while (i < d) {
      val aip = a(i)(p); val aiq = a(i)(q)
      a(i)(p) = c * aip - s * aiq
      a(i)(q) = s * aip + c * aiq
      i += 1
    }
    i = 0
    while (i < d) {
      val api = a(p)(i); val aqi = a(q)(i)
      a(p)(i) = c * api - s * aqi
      a(q)(i) = s * api + c * aqi
      i += 1
    }
    i = 0
    while (i < d) {
      val vip = v(i)(p); val viq = v(i)(q)
      v(i)(p) = c * vip - s * viq
      v(i)(q) = s * vip + c * viq
      i += 1
    }
  }
}
