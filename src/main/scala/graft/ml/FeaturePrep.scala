package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic feature-preparation transforms.
  *
  * Min-max scaling is chosen over z-score standardization deliberately:
  * min/max are EXACT under any aggregation order, so the scaled values
  * are bit-identical across engines and across reruns — a double `sum`
  * (the mean/stddev path) is partial-aggregated in nondeterministic order
  * and can drift in the last ulp between plans. Determinism is a design
  * requirement of this library (SURVEY §7.1). */
object FeaturePrep {

  /** Scale each column to [0, 1] by its global (min, max); constant
    * columns map to 0.0. The stats come from ONE aggregate row that joins
    * back by broadcast cross-join — two scans total, no shuffle of the
    * data side, scale-safe at any row count. Appends `<col>_scaled`. */
  def minMaxScale(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "minMaxScale needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__min_$c"),
      max(col(c).cast("double")).as(s"__max_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    val scaled = cols.foldLeft(joined) { (d, c) =>
      val lo = col(s"__min_$c")
      val hi = col(s"__max_$c")
      d.withColumn(s"${c}_scaled",
        when(hi > lo,
          graft.functions.q6((col(c).cast("double") - lo) / (hi - lo)))
          .otherwise(lit(0.0)))
    }
    scaled.drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }

  /** F14: POINT-IN-TIME TRAINING-MATRIX ASSEMBLY — the feature-store
    * payoff operation: one label table AS-OF-joined against N feature
    * tables so every feature column holds the value that was visible
    * AT the label's timestamp, never after (no label leakage, the
    * whole point of a point-in-time store). Each feature table is
    * `(keys, tsCol, value columns…)`, value columns get `<prefix>_`
    * names and `<prefix>_asof_ts` records which feature row actually
    * matched — per feature, all columns come from the SAME matched row
    * ([[graft.relational.Joins.asOfJoin]]'s struct-payload contract).
    *
    * Scale shape: a fold of N as-of joins, each ONE shuffle keyed on
    * the entity (the union+window form — zero pair explosion); the
    * label table stays the spine, so row count never grows. Feature
    * tables must be unique per (keys, ts) — pre-aggregate upstream or
    * set `checkUnique`. */
  def pointInTimeMatrix(labels: DataFrame, keys: Seq[String],
      labelTs: String, features: Seq[(String, DataFrame, String)],
      toleranceSec: Option[Long] = None,
      checkUnique: Boolean = false): DataFrame = {
    require(features.nonEmpty, "pointInTimeMatrix needs >= 1 feature table")
    val prefixes = features.map(_._1)
    require(prefixes.distinct.size == prefixes.size,
      s"duplicate feature prefixes: ${prefixes.mkString(", ")}")
    features.foldLeft(labels) { case (acc, (prefix, feat, ftsCol)) =>
      val valCols = feat.columns.filterNot(keys.contains)
        .filterNot(_ == ftsCol).toSeq
      val renamed = valCols.foldLeft(feat) { (d, c) =>
        d.withColumnRenamed(c, s"${prefix}_$c")
      }
      graft.relational.Joins.asOfJoin(acc, renamed, keys, labelTs,
          ftsCol, toleranceSec, checkUnique)
        .withColumnRenamed("asof_ts", s"${prefix}_asof_ts")
    }
  }
}
