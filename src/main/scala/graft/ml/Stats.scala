package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed statistical primitives: grouped OLS and leakage-safe
  * categorical target encoding.
  *
  * Both reduce to single partial-aggregated passes — the shapes that
  * survive a 100 TB input are exactly the ones where every row is
  * touched once and only group-sized state crosses the shuffle. */
object Stats {

  /** Per-group simple linear regression y = a·x + b via the native SQL
    * regression aggregates (`regr_slope` / `regr_intercept` /
    * `regr_r2`, codegen'd Welford-merge implementations — one
    * map-side-combined exchange of constant-size moment state per
    * group). Rows where either side is NULL are ignored by the
    * aggregates themselves (ANSI regr_* semantics, same in DuckDB —
    * which is the oracle). */
  def groupedOls(df: DataFrame, groups: Seq[String], y: Column,
      x: Column): DataFrame =
    df.groupBy(groups.map(col): _*)
      .agg(
        regr_count(y, x).as("n"),
        regr_slope(y, x).as("slope"),
        regr_intercept(y, x).as("intercept"),
        regr_r2(y, x).as("r2"),
        // NOT the native corr: under ANSI mode Spark's corr raises
        // DIVIDE_BY_ZERO on a zero-variance group instead of returning
        // NULL. The population-moment ratio is the same value ((n−1)
        // factors cancel against the sample form DuckDB's corr uses)
        // and the guard makes the degenerate group NULL, matching SQL
        // corr semantics.
        covar_pop(y, x).as("__cov"),
        stddev_pop(x).as("__sdx"),
        stddev_pop(y).as("__sdy"))
      .withColumn("pearson",
        when(col("__sdx") > 0 && col("__sdy") > 0,
          col("__cov") / (col("__sdx") * col("__sdy"))))
      .drop("__cov", "__sdx", "__sdy")

  /** Leave-one-out target encoding: each row's category is replaced by
    * the mean label of the OTHER rows in its category —
    * `(Σ_c y − y_i) / (n_c − 1)` — the standard leakage guard (a row
    * must not see its own label inside its feature; Micci-Barreca 2001,
    * plain mean version). Singleton categories (n_c = 1) have no other
    * rows and fall back to the global mean computed WITHOUT the row
    * itself (same guard, degenerate case).
    *
    * Label must be numeric; with a 0/1 label every sum is an exact
    * integer in IEEE doubles, so one final division is the only inexact
    * step and the encoding is bit-reproducible cross-engine.
    *
    * Plan: one category-sized aggregate broadcast back onto the rows +
    * one 2-value global aggregate (a 1-row cross join) — the row side is
    * never shuffled, so the operator composes map-side with whatever
    * scan precedes it. */
  def targetEncodeLoo(df: DataFrame, category: Column, label: Column,
      encodedCol: String = "encoded"): DataFrame = {
    val tagged = df.withColumn("__cat", category)
      .withColumn("__y", label.cast("double"))
    val perCat = tagged.groupBy(col("__cat"))
      .agg(sum(col("__y")).as("__sum_c"),
        count(col("__y")).as("__n_c"))
    val global = tagged.agg(sum(col("__y")).as("__sum_g"),
      count(col("__y")).as("__n_g"))
    tagged
      .join(broadcast(perCat), Seq("__cat"))
      .crossJoin(broadcast(global))
      .withColumn(encodedCol,
        when(col("__n_c") > 1,
          (col("__sum_c") - col("__y")) / (col("__n_c") - 1))
          .otherwise(
            (col("__sum_g") - col("__y")) / (col("__n_g") - 1)))
      .drop("__cat", "__y", "__sum_c", "__n_c", "__sum_g", "__n_g")
  }
}
