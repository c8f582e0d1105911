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
}
