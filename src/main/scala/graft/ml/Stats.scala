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

  /** F40: χ² INDEPENDENCE TEST + CRAMÉR'S V between two categoricals
    * (Cramér 1946) — the bounded-[0,1] companion to [[mutualInformation]]
    * (V is comparable across tables of different size/cardinality,
    * which raw MI and raw χ² are not): `χ² = Σ (o − e)²/e` with
    * `e = n_x·n_y/n`, `V = √(χ²/(n·(min(R,C) − 1)))`.
    *
    * Determinism: cells/marginals are the same one-pass exact-BIGINT
    * re-aggregation as F35; expected counts multiply DOUBLES (BIGINT
    * products of 100 TB-scale marginals overflow); χ² sums quantized-6
    * scaled LONGs (order-free). Both-constant tables (min(R,C) = 1)
    * emit NULL V — there is no association to measure. Output: 1 row
    * (n, r_levels, c_levels, dof, chi2, cramers_v).
    *
    * 100 TB: one map-side-combined groupBy of the data; every later
    * aggregate runs on the cardinality²-sized cell table. */
  def cramersV(df: DataFrame, x: Column, y: Column): DataFrame = {
    val cells = df.groupBy(x.as("x"), y.as("y"))
      .agg(count(lit(1)).as("n_xy"))
    val margX = cells.groupBy(col("x")).agg(sum(col("n_xy")).as("__n_x"))
    val margY = cells.groupBy(col("y")).agg(sum(col("n_xy")).as("__n_y"))
    val shape = cells.agg(sum(col("n_xy")).as("__n"),
      count_distinct(col("x")).as("__r"), count_distinct(col("y")).as("__c"))
    // χ² runs over the FULL R×C grid — zero cells carry (0−e)²/e mass
    // (dropping them under-reports association; a perfect bijection
    // would score V = 1/√2 instead of 1). The grid is the marginal
    // cross join: cardinality²-sized, never the data.
    val joined = margX.crossJoin(broadcast(margY))
      .join(cells, Seq("x", "y"), "left")
      .withColumn("n_xy", coalesce(col("n_xy"), lit(0L)))
      .crossJoin(broadcast(shape))
    val o = col("n_xy").cast("double")
    val e = col("__n_x").cast("double") * col("__n_y").cast("double") /
      col("__n").cast("double")
    val chiTot = joined
      .withColumn("__chi_scaled",
        floor((o - e) * (o - e) / e * lit(1e6) + lit(0.5)).cast("long"))
      .agg(sum(col("__chi_scaled")).as("__chi_tot"))
    val chi2 = col("__chi_tot").cast("double") / lit(1e6)
    val minDim = least(col("__r"), col("__c")).cast("double") - lit(1.0)
    shape.crossJoin(broadcast(chiTot))
      .select(col("__n").as("n"), col("__r").as("r_levels"),
        col("__c").as("c_levels"),
        ((col("__r") - 1) * (col("__c") - 1)).as("dof"),
        chi2.as("chi2"),
        when(col("__r") > 1 && col("__c") > 1,
          graft.functions.q6(
            sqrt(chi2 / (col("__n").cast("double") * minDim))))
          .as("cramers_v"))
  }

  /** F35: MUTUAL INFORMATION between two categoricals (Cover & Thomas
    * 2006 §2.3) — the model-free dependence screen run before any
    * feature is admitted: per contingency cell, the joint probability,
    * pointwise MI `ln(n·c_xy / (c_x·c_y))` and the cell's MI term
    * `p_xy · pmi`; plus three broadcast summary columns on every row —
    * `mi_total`, the marginal entropies' product-root and the
    * normalized `nmi = MI / sqrt(H(x)·H(y))` (1 = deterministic
    * bijection, 0 = independent; NULL when either variable is
    * constant, H = 0).
    *
    * Determinism: all counts exact BIGINT from ONE groupBy of the data;
    * marginals and the grand total are re-aggregated from the CELL
    * table (cardinality², not data, sized); pmi/terms are fixed IEEE
    * trees (counts cast to double BEFORE multiplying — BIGINT products
    * of 100 TB-scale counts would overflow); `mi_total` and both
    * entropies sum QUANTIZED-6 terms as scaled LONGs, so no
    * aggregation-order ulp drift. NULL category values group as their
    * own level. */
  def mutualInformation(df: DataFrame, x: Column, y: Column)
      : DataFrame = {
    val cells = df.groupBy(x.as("x"), y.as("y"))
      .agg(count(lit(1)).as("n_xy"))
    val margX = cells.groupBy(col("x")).agg(sum(col("n_xy")).as("__n_x"))
    val margY = cells.groupBy(col("y")).agg(sum(col("n_xy")).as("__n_y"))
    def entScaled(marg: DataFrame, cnt: String): DataFrame = {
      // H = -sum p ln p, each term quantized-6 then LONG-summed
      val tot = marg.agg(sum(col(cnt)).as("__t"))
      marg.crossJoin(broadcast(tot))
        .withColumn("__p", col(cnt).cast("double") / col("__t"))
        .agg(sum(floor(-col("__p") * log(col("__p")) * lit(1e6) +
          lit(0.5)).cast("long")).as("__h_scaled"))
    }
    val hX = entScaled(margX, "__n_x")
      .withColumnRenamed("__h_scaled", "__hx_scaled")
    val hY = entScaled(margY, "__n_y")
      .withColumnRenamed("__h_scaled", "__hy_scaled")
    val total = cells.agg(sum(col("n_xy")).as("__n"))
    val joined = cells
      .join(broadcast(margX), Seq("x"))
      .join(broadcast(margY), Seq("y"))
      .crossJoin(broadcast(total))
    val pXy = col("n_xy").cast("double") / col("__n").cast("double")
    val pmi = log((col("n_xy").cast("double") * col("__n").cast("double")) /
      (col("__n_x").cast("double") * col("__n_y").cast("double")))
    val terms = joined
      .withColumn("p_xy", graft.functions.q6(pXy))
      .withColumn("pmi", graft.functions.q6(pmi))
      .withColumn("__mi_scaled",
        floor(pXy * pmi * lit(1e6) + lit(0.5)).cast("long"))
    val miTotal = terms.agg(sum(col("__mi_scaled")).as("__mi_tot_scaled"))
    val hx = col("__hx_scaled").cast("double") / lit(1e6)
    val hy = col("__hy_scaled").cast("double") / lit(1e6)
    val mi = col("__mi_tot_scaled").cast("double") / lit(1e6)
    terms.crossJoin(broadcast(miTotal))
      .crossJoin(broadcast(hX)).crossJoin(broadcast(hY))
      .select(col("x"), col("y"), col("n_xy"), col("p_xy"), col("pmi"),
        (col("__mi_scaled").cast("double") / lit(1e6)).as("mi_term"),
        mi.as("mi_total"),
        when(col("__hx_scaled") > 0 && col("__hy_scaled") > 0,
          graft.functions.q6(mi / sqrt(hx * hy))).as("nmi"))
  }

  /** F55: THEIL–SEN ROBUST SLOPE per group (Theil 1950, Sen 1968,
    * public knowledge) — the median of all pairwise slopes
    * `(y_j − y_i)/(x_j − x_i)` over pairs with distinct x, with the
    * standard intercept `median(y − m·x)`. Breakdown point ~29%: one
    * wild y cannot drag the fit the way it drags
    * [[groupedOls]]'s least squares.
    *
    * All pairs is inherently O(n_g²) PER GROUP — correct only when
    * groups are bounded, so the cap FAILS LOUD (`maxGroupSize`,
    * enforced row-level with `raise_error`) instead of silently
    * sampling: a silent cap would change the estimator (the
    * basket-cap lesson). The pair join is group-keyed (row-number
    * identity within group; never a cross join across groups); the
    * medians are exact `percentile(0.5)` per group — the midpoint
    * average two engines interpolate identically.
    *
    * 100 TB: group-keyed shuffles only; pair volume bounded by
    * `groups × maxGroupSize²`. For unbounded groups use
    * [[groupedOls]] or pre-aggregate. Output per group:
    * (g, n_points, n_pairs, slope, intercept); groups with no
    * distinct-x pair emit NULL slope/intercept. */
  def theilSen(df: DataFrame, group: Column, x: Column, y: Column,
      maxGroupSize: Int = 2000): DataFrame = {
    require(maxGroupSize >= 2,
      s"maxGroupSize must be >= 2, got $maxGroupSize")
    val base = df.filter(x.isNotNull && y.isNotNull)
      .select(group.as("g"), x.cast("double").as("x"),
        y.cast("double").as("y"))
    // EAGER cap check — one tiny count job BEFORE the pair join exists.
    // A lazy raise_error guard column is useless here: its stage queues
    // BEHIND the 10^8-row pair stages it is supposed to prevent (and a
    // count()-shaped consumer can prune it away entirely), so by the
    // time it fires the explosion has already been paid.
    val over = base.groupBy(col("g"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxGroupSize)
      .limit(1).collect()
    require(over.isEmpty,
      s"theilSen: group ${over.headOption.map(_.get(0)).orNull} has " +
        s"${over.headOption.map(_.getLong(1)).getOrElse(0L)} rows, " +
        s"exceeds maxGroupSize=$maxGroupSize — all-pairs would " +
        "explode; pre-aggregate or raise the cap explicitly")
    val wG = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("x"), col("y"))
    val sized = base
      .withColumn("__rn", row_number().over(wG))
    val l = sized.select(col("g"), col("x").as("x1"), col("y").as("y1"),
      col("__rn").as("rn1"))
    // (sized still carries __rn only; the guard ran eagerly above)
    val r = sized.select(col("g").as("g2"), col("x").as("x2"),
      col("y").as("y2"), col("__rn").as("rn2"))
    val pairs = l.join(r, col("g") === col("g2") &&
        col("rn1") < col("rn2") && col("x1") =!= col("x2"))
      .select(col("g"),
        ((col("y2") - col("y1")) / (col("x2") - col("x1"))).as("__m"))
    // exact median via a group-keyed RANK, not `percentile`: the
    // percentile aggregate buffers every slope of a group in executor
    // memory (32M pairs/group at a 10x scale-up sat in one GC-bound
    // buffer); the window sort spills to disk and streams. The
    // midpoint uses percentile's own lo + (hi - lo)*0.5 interpolation
    // so existing oracle parity is preserved.
    val wm = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("__m"))
    val rankedSlopes = pairs
      .withColumn("__rn", row_number().over(wm))
      .withColumn("__np",
        org.apache.spark.sql.functions.count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
    // persisted: the slope table feeds BOTH the output join and the
    // intercept residual pass — without it the 10^7-row pair lineage
    // recomputes twice (measured 23s -> 2.5s at sf0.1)
    val slopes = graft.util.Caches.persistTracked(rankedSlopes
      .filter(col("__rn") === expr("(__np + 1) div 2") ||
        col("__rn") === expr("(__np + 2) div 2"))
      .groupBy(col("g"))
      .agg(max(col("__np")).as("n_pairs"),
        (min(col("__m")) +
          (max(col("__m")) - min(col("__m"))) * lit(0.5)).as("slope_raw")))
    val counts = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n_points"))
    val withSlope = counts.join(slopes, Seq("g"), "left")
    val inter = base.join(withSlope.select(col("g"),
        col("slope_raw")), Seq("g"), "left")
      .filter(col("slope_raw").isNotNull)
      .withColumn("__iv", col("y") - col("slope_raw") * col("x"))
      .withColumn("__irn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("__iv"))))
      .withColumn("__in",
        org.apache.spark.sql.functions.count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
      .filter(col("__irn") === expr("(__in + 1) div 2") ||
        col("__irn") === expr("(__in + 2) div 2"))
      .groupBy(col("g"))
      .agg((min(col("__iv")) +
        (max(col("__iv")) - min(col("__iv"))) * lit(0.5))
        .as("intercept_raw"))
    import graft.functions.q6
    withSlope.join(inter, Seq("g"), "left")
      .select(col("g"), col("n_points"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        q6(col("slope_raw")).as("slope"),
        q6(col("intercept_raw")).as("intercept"))
  }
}
