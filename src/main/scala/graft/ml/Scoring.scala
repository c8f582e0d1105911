package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F10: model-scoring surface (reference:
  * common/utility/scoringFunctions.scala:24-49 scored H2O POJOs row by
  * row). Re-expressed as a Column-expression scorer so scoring stays inside
  * codegen; the model itself is STUBBED — this container has no model
  * runtime, so [[LinearModel]] is the deterministic stand-in and
  * [[Model.score]] is the integration point a real backend would plug
  * into (e.g. an mapInPandas/ONNX scorer on a real deployment). */
trait Model extends Serializable {
  /** Build the score as a column expression over the feature columns. */
  def score(features: Seq[Column]): Column
}

/** Deterministic linear stand-in: dot(weights, features) + bias. */
case class LinearModel(weights: Seq[Double], bias: Double = 0.0) extends Model {
  def score(features: Seq[Column]): Column =
    features.zip(weights).map { case (f, w) => f.cast("double") * w }
      .reduce(_ + _) + lit(bias)
}

/** A binary decision tree over numeric columns. Split semantics:
  * `feature <= threshold` (or `<` when `strict`) goes left, else right; a
  * NULL feature goes right by default, or left when `missingLeft` — the
  * XGBoost `missing`-branch convention, which [[ModelIngest]] maps onto
  * these flags. Both engines evaluate the identical SQL `CASE` shape: the
  * NULL direction is encoded by which comparison guards the WHEN (a NULL
  * comparison is never true, so the `otherwise` side receives NULLs). */
sealed trait TreeNode extends Serializable
case class Leaf(value: Double) extends TreeNode
case class Split(feature: String, threshold: Double,
    left: TreeNode, right: TreeNode,
    missingLeft: Boolean = false, strict: Boolean = false) extends TreeNode

/** Tree-ensemble scoring COMPILED to native expressions — the real
  * replacement for row-at-a-time POJO scoring (reference:
  * common/utility/scoringFunctions.scala:24-49): a GBM/RF-style ensemble
  * becomes nested `when()` columns summed left-to-right, fully inside
  * whole-stage codegen with zero UDF or model-runtime dependency, and the
  * SAME compiler emits the ANSI SQL `CASE` text so an independent engine
  * scores bit-identically. [[ModelIngest]] parses trained-artifact tree
  * dumps into [[TreeNode]]s; the evaluator here is complete. */
object TreeScoring {
  def compile(t: TreeNode): Column = t match {
    case Leaf(v) => lit(v)
    case Split(f, thr, l, r, missingLeft, strict) =>
      val c = col(f).cast("double")
      (missingLeft, strict) match {
        case (false, false) => when(c <= thr, compile(l)).otherwise(compile(r))
        case (false, true)  => when(c < thr, compile(l)).otherwise(compile(r))
        case (true, false)  => when(c > thr, compile(r)).otherwise(compile(l))
        case (true, true)   => when(c >= thr, compile(r)).otherwise(compile(l))
      }
  }

  /** ANSI SQL mirror of [[compile]] — same shape, same NULL routing. */
  def compileSql(t: TreeNode): String = t match {
    case Leaf(v) => v.toString
    case Split(f, thr, l, r, missingLeft, strict) =>
      val c = s"CAST($f AS DOUBLE)"
      val (cond, thn, els) = (missingLeft, strict) match {
        case (false, false) => (s"$c <= $thr", l, r)
        case (false, true)  => (s"$c < $thr", l, r)
        case (true, false)  => (s"$c > $thr", r, l)
        case (true, true)   => (s"$c >= $thr", r, l)
      }
      s"CASE WHEN $cond THEN ${compileSql(thn)} ELSE ${compileSql(els)} END"
  }

  /** Sum-of-trees score (+ bias), accumulated left-to-right so the double
    * result is bit-identical to the SQL mirror's `bias + t1 + t2 + …`. */
  def scoreEnsemble(df: DataFrame, trees: Seq[TreeNode],
      bias: Double = 0.0, outCol: String = "score"): DataFrame =
    df.withColumn(outCol,
      round(trees.map(compile).foldLeft(lit(bias))(_ + _), 6))

  /** The SQL expression matching [[scoreEnsemble]]'s output column. */
  def scoreEnsembleSql(trees: Seq[TreeNode], bias: Double = 0.0): String =
    s"round(${trees.map(compileSql).foldLeft(bias.toString)((a, t) => s"$a + $t")}, 6)"
}

object Scoring {
  /** Append a `score` column; enum re-coding (the reference's domain-value
    * mapping) is expressed as an optional per-column recode map. */
  def score(df: DataFrame, featureCols: Seq[String], model: Model,
      recode: Map[String, Map[String, Double]] = Map.empty): DataFrame = {
    val feats = featureCols.map { c =>
      recode.get(c) match {
        case Some(m) =>
          // unmapped enum value -> NULL (propagates to a NULL score),
          // matching SQL CASE semantics, not NaN
          m.foldLeft(lit(null).cast("double")) { case (acc, (k, v)) =>
            when(col(c) === k, lit(v)).otherwise(acc)
          }
        case None => col(c)
      }
    }
    df.withColumn("score", model.score(feats))
  }

  /** F33: PER-FEATURE LINEAR ATTRIBUTION — exact SHAP values for a
    * linear model (Lundberg & Lee 2017, Corollary 1: under a linear f
    * with independent features, `phi_i = w_i * (x_i - E[x_i])`), the
    * per-row "why did THIS row score high" table: the raw score, one
    * `contrib_<f>` column per feature, and the population baseline
    * `E[score]` (contributions sum to score - baseline by construction).
    *
    * Feature means are DECIMAL(28,10)-exact sums over per-feature
    * non-null counts (engine/partition-order-proof) cast to double ONCE
    * before a single division; the per-row attribution is then a fixed
    * IEEE expression tree. All emitted doubles quantized-6.
    *
    * 100 TB: one map-side-combined aggregate for the means, broadcast
    * back as a 1-row cross join — the scored relation itself is never
    * shuffled. */
  def linearContributions(df: DataFrame,
      weights: Seq[(String, Double)], bias: Double): DataFrame = {
    require(weights.nonEmpty, "need at least one weighted feature")
    val aggs = weights.flatMap { case (c, _) =>
      Seq(sum(col(c).cast("decimal(28,10)")).as(s"__s_$c"),
        count(col(c)).as(s"__n_$c"))
    }
    val means = df.agg(aggs.head, aggs.tail: _*)
    val withMeans = df.crossJoin(broadcast(means))
    val mu = weights.map { case (c, _) =>
      c -> (col(s"__s_$c").cast("double") / col(s"__n_$c"))
    }.toMap
    val score = weights.map { case (c, w) =>
      col(c).cast("double") * lit(w)
    }.reduce(_ + _) + lit(bias)
    val baseline = weights.map { case (c, w) =>
      mu(c) * lit(w)
    }.reduce(_ + _) + lit(bias)
    val contribs = weights.map { case (c, w) =>
      graft.functions.q6((col(c).cast("double") - mu(c)) * lit(w))
        .as(s"contrib_$c")
    }
    withMeans
      .withColumn("score", graft.functions.q6(score))
      .withColumn("baseline", graft.functions.q6(baseline))
      .select(df.columns.map(col) ++
        Seq(col("score"), col("baseline")) ++ contribs: _*)
  }
}
