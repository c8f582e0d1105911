package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch analytics (Apache DataSketches HLL, exposed by Spark
  * 4 as `hll_sketch_agg` / `hll_union_agg`) — the approximate surface a
  * 100 TB store runs instead of exact distincts: per-partition/per-day
  * sketch TABLES are tiny (≤ ~2 KB per group at lgK 12), persistable,
  * and union-able, so "distinct tokens this quarter" is a merge over
  * stored sketches — no re-scan of raw data, no count-distinct shuffle
  * of the full corpus.
  */
object Sketches {

  /** Per-group distinct report with its own audit: the exact count, the
    * HLL estimate checked against it (`approx_ok`, relative error ≤
    * `relErr`), and a split-merge consistency check (`merge_ok`) —
    * sketches built over the `splitExpr` row partition and UNIONED must
    * estimate what the one-pass sketch estimates, the property that
    * makes persisted sketch tables sound.
    *
    * The exact count is corpus-priced (it exists to audit the sketch;
    * production reads drop it and keep only the sketch columns). Both
    * sketch paths are map-side-combinable aggregates. */
  def mergeableDistinct(df: DataFrame, groupCol: String, valueCol: String,
      splitExpr: Column, relErr: Double = 0.05): DataFrame = {
    require(relErr > 0, s"relErr must be positive, got $relErr")
    val full = df.groupBy(col(groupCol))
      .agg(count_distinct(col(valueCol)).as("exact_distinct"),
        hll_sketch_estimate(hll_sketch_agg(col(valueCol))).as("__est"))
    val merged = df.withColumn("__h", splitExpr)
      .groupBy(col(groupCol), col("__h"))
      .agg(hll_sketch_agg(col(valueCol)).as("__sk"))
      .groupBy(col(groupCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("__sk"))).as("__mest"))
    full.join(merged, groupCol)
      .select(col(groupCol), col("exact_distinct"),
        when(col("exact_distinct") > 0,
          abs(col("__est") - col("exact_distinct")) /
            col("exact_distinct") <= relErr)
          .otherwise(col("__est") === 0).as("approx_ok"),
        (abs(col("__mest") - col("__est")) /
          greatest(col("__est"), lit(1.0)) <= 0.01).as("merge_ok"))
  }

  /** Per-group quantile report with its own audit: the exact
    * interpolated median (cross-engine comparable — both engines use
    * type-7 linear interpolation), plus `percentile_approx` (the
    * Greenwald–Khanna mergeable summary, the sketch a 100 TB scan
    * actually runs) audited against its rank guarantee: the returned
    * element's exact rank must sit within ±n/accuracy of the target
    * rank. One corpus aggregate builds counts + sketch + exact check
    * values; a second pass ranks the (broadcast, per-group) approx
    * answers against the raw rows. The exact median is audit
    * scaffolding — production keeps only the sketch column. */
  def quantileReport(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double] = Seq(0.25, 0.5, 0.9), accuracy: Int = 100)
      : DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p < 1),
      s"percentiles must lie in (0,1), got $ps")
    val v = col(valueCol).cast("double")
    val base = df.select(col(groupCol), v.as("__v"))
    val agg = base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        round(expr(s"percentile(__v, 0.5)"), 4).as("exact_p50"),
        percentile_approx(col("__v"),
          array(ps.map(lit): _*), lit(accuracy)).as("__ap"))
    val eps = 1.0 / accuracy
    val rankCols = ps.indices.flatMap { i =>
      val a = col("__ap").getItem(i)
      Seq(sum(when(col("__v") <= a, 1L).otherwise(0L)).as(s"__le$i"),
        sum(when(col("__v") < a, 1L).otherwise(0L)).as(s"__lt$i"))
    }
    val audited = base.join(broadcast(agg), Seq(groupCol))
      .groupBy(col(groupCol), col("n"), col("exact_p50"))
      .agg(rankCols.head, rankCols.tail: _*)
    ps.indices.foldLeft(audited) { (d, i) =>
      val p = ps(i)
      d.withColumn(s"ok_p${(p * 100).round}",
        col(s"__le$i") >= lit(p) * col("n") - lit(eps) * col("n") - 1 &&
          col(s"__lt$i") <= lit(p) * col("n") + lit(eps) * col("n") + 1)
    }.select(col(groupCol) +: col("n") +: col("exact_p50") +:
      ps.map(p => col(s"ok_p${(p * 100).round}")): _*)
  }
}
