package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** F51: PROPENSITY-SCORE CALIPER MATCHING (Rosenbaum & Rubin 1983,
  * caliper form per Cochran & Rubin 1973 — public knowledge): for each
  * treated unit, the nearest control BY SCORE within a caliper, with
  * replacement; the matched outcome difference estimates the ATT.
  *
  * The naive nearest-neighbor is a sorted merge — a global-order scan.
  * The shuffle-friendly shape: BUCKET scores into caliper-width bins
  * and equi-join treated bins {b−1, b, b+1} against control bins — any
  * pair within the caliper differs by at most one bin index, so the
  * 3-bin join is LOSSLESS for caliper matching, and the join key is a
  * bounded-cardinality integer (≤ 1/caliper bins): a plain shuffled
  * equi-join, skew-bounded by bin population, never a cross join.
  * Per-treated argmin runs under `Window.partitionBy(treated id)` —
  * partition size = candidates in 3 bins, caliper-bounded.
  *
  * Ties (a control equidistant above and below) break deterministically
  * by (|Δ|, control score, control id). Unmatched treated units are
  * ABSENT from the pair table (count them against `treated` for the
  * match rate — [[att]] reports it).
  *
  * 100 TB: one shuffle each side on the bin key; no global order, no
  * driver state. Matching WITH replacement keeps it one pass —
  * without-replacement matching is inherently sequential (greedy) and
  * is out of scope by design. */
object Matching {

  /** Pair table: (t_id, t_score, t_y, c_id, c_score, c_y, dist).
    * Inputs: `treated`/`control` DataFrames with (id, score, y)
    * columns named by the caller. Scores must be non-null doubles.
    *
    * Shape: the nearest in-caliper control is found WITHOUT ever
    * materializing the in-caliper pair set (treated × bin-population
    * exploded to 10⁸ rows at a 10× scale-up). In 1-D the nearest
    * control is one of at most four candidates:
    * within-bin nearest at-or-below (a bin-keyed running `last` over
    * the score-sorted union — equal-score controls sort before the
    * treated row via the side marker, ids DESC so ties surface the
    * LOWEST id), within-bin nearest strictly-above (the mirrored
    * `first`, ids ASC), and the previous/next bin's boundary controls
    * (2-row per-bin aggregates — any farther bin is > caliper away by
    * construction). The winner is `least()` over
    * (dist, c_score, c_id) candidate structs — the exact
    * argmin-with-tie-break the all-pairs form computes. */
  def caliperMatch(treated: DataFrame, control: DataFrame,
      caliper: Double): DataFrame = {
    require(caliper > 0, s"caliper must be > 0, got $caliper")
    val t = treated.select(col("id").cast("long").as("__id"),
      col("score").cast("double").as("__s"),
      col("y").cast("double").as("__y"))
      .filter(col("__s").isNotNull)
      .withColumn("__m", lit(1))
    val c = control.select(col("id").cast("long").as("__id"),
      col("score").cast("double").as("__s"),
      col("y").cast("double").as("__y"))
      .filter(col("__s").isNotNull)
      .withColumn("__m", lit(0))
    val u = t.unionByName(c)
      .withColumn("__bin", floor(col("__s") / lit(caliper)))
    val payload = when(col("__m") === 0,
      struct(col("__id"), col("__s"), col("__y")))
    val wPrev = Window.partitionBy(col("__bin"))
      .orderBy(col("__s").asc, col("__m").asc, col("__id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("__bin"))
      .orderBy(col("__s").asc, col("__m").asc, col("__id").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val windowed = u
      .withColumn("__prev", last(payload, ignoreNulls = true).over(wPrev))
      .withColumn("__next", first(payload, ignoreNulls = true).over(wNext))
      .filter(col("__m") === 1)
    val cBinned = c.withColumn("__bin", floor(col("__s") / lit(caliper)))
    val below = cBinned.groupBy(col("__bin"))
      .agg(max_by(struct(col("__id"), col("__s"), col("__y")),
        struct(col("__s"), -col("__id"))).as("__below"))
      .select((col("__bin") + 1).as("__bin"), col("__below"))
    val above = cBinned.groupBy(col("__bin"))
      .agg(min_by(struct(col("__id"), col("__s"), col("__y")),
        struct(col("__s"), col("__id"))).as("__above"))
      .select((col("__bin") - 1).as("__bin"), col("__above"))
    def cand(s: Column): Column = when(s.isNotNull &&
      abs(col("__s") - s.getField("__s")) <= lit(caliper),
      struct(abs(col("__s") - s.getField("__s")).as("d"),
        s.getField("__s").as("cs"), s.getField("__id").as("ci"),
        s.getField("__y").as("cy")))
    val best = least(cand(col("__prev")), cand(col("__next")),
      cand(col("__below")), cand(col("__above")))
    windowed
      .join(below, Seq("__bin"), "left")
      .join(above, Seq("__bin"), "left")
      .withColumn("__best", best)
      .filter(col("__best").isNotNull)
      .select(col("__id").as("t_id"), col("__s").as("t_score"),
        col("__y").as("t_y"),
        col("__best.ci").as("c_id"), col("__best.cs").as("c_score"),
        col("__best.cy").as("c_y"),
        graft.functions.q6(col("__best.d")).as("dist"))
  }

  /** The ATT summary over a [[caliperMatch]] pair table: matched
    * count, match rate against the full treated count, and the mean
    * matched outcome difference — DECIMAL(18,6)-exact Σ(y_t − y_c),
    * one double division, quantized-6. Output 1 row:
    * (n_treated, n_matched, match_rate, att). */
  def att(matches: DataFrame, nTreated: Long): DataFrame = {
    require(nTreated > 0, "att: no treated units")
    matches.agg(
      count(lit(1)).as("n_matched"),
      coalesce(sum(col("t_y").cast("decimal(18,6)") -
        col("c_y").cast("decimal(18,6)")),
        lit(java.math.BigDecimal.ZERO).cast("decimal(18,6)"))
        .as("__sd"))
      .select(lit(nTreated).as("n_treated"), col("n_matched"),
        graft.functions.q6(col("n_matched").cast("double") /
          lit(nTreated.toDouble)).as("match_rate"),
        graft.functions.q6(when(col("n_matched") > 0,
          col("__sd").cast("double") / col("n_matched").cast("double")))
          .as("att"))
  }

  /** Eager propensity-integrity guard shared by [[ipwAte]]/[[aipwAte]]:
    * one tiny aggregate job that FAILS LOUD on NULL or out-of-(0,1)
    * propensities before any weighted sum runs. Silently clipping or
    * dropping them would bias the estimate invisibly (the basket-cap
    * lesson: truncation must be an explicit caller decision). */
  private def requireValidPropensity(rows: DataFrame, what: String): Unit = {
    val r = rows.agg(
      count(lit(1)).as("n"),
      count(when(col("__e").isNull || col("__y").isNull, 1)).as("bad"),
      min(col("__e")).as("lo"), max(col("__e")).as("hi")).head()
    require(r.getLong(0) > 0, s"$what: empty input")
    require(r.getLong(1) == 0L,
      s"$what: ${r.getLong(1)} rows with NULL outcome/propensity — " +
        "impute or filter explicitly upstream")
    require(r.getDouble(2) > 0.0 && r.getDouble(3) < 1.0,
      f"$what: propensity must lie strictly in (0,1), got " +
        f"[${r.getDouble(2)}, ${r.getDouble(3)}] — trim or re-fit " +
        "(extreme propensities make the weights unbounded)")
  }

  /** F79: POSITIVITY / OVERLAP DIAGNOSTIC (the "common support" check
    * — Rosenbaum & Rubin 1983's assumption, diagnosed per Crump 2009-
    * style trimming practice; public knowledge): the pre-flight every
    * [[ipwAte]]/[[aipwAte]]/[[caliperMatch]] run needs — a propensity
    * stratum where only ONE arm has mass makes the estimand
    * undefined there (IPW silently extrapolates; matching silently
    * drops). Bins e into `bins` fixed-width strata and reports both
    * arms' exact counts, the treated share, and a per-bin
    * `positivity_ok` — plus each bin's weight ceiling `1/lo` proxy via
    * the bin floor, so the caller sees WHERE trimming would bite.
    *
    * Exactness: bin = ⌊e·bins⌋ clamped (e strictly in (0,1), fail-loud
    * like the estimators); counts exact; the single share division
    * quantized. One aggregate. Output: one row per OCCUPIED bin —
    * (bin, lo, hi, n_treated, n_control, share_treated,
    * positivity_ok). */
  def positivityReport(df: DataFrame, treated: Column,
      propensity: Column, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val rows = df.select(treated.cast("int").as("__t"),
      propensity.cast("double").as("__e"),
      propensity.cast("double").as("__y")) // guard reuses __y slot
    requireValidPropensity(rows, "positivityReport")
    val b = least(floor(col("__e") * bins).cast("long"),
      lit(bins - 1L))
    import graft.functions.q6
    rows.groupBy(b.as("bin"))
      .agg(sum(when(col("__t") === 1, 1L).otherwise(0L))
          .as("n_treated"),
        sum(when(col("__t") =!= 1, 1L).otherwise(0L)).as("n_control"))
      .select(col("bin"),
        q6(col("bin").cast("double") / bins).as("lo"),
        q6((col("bin") + lit(1L)).cast("double") / bins).as("hi"),
        col("n_treated"), col("n_control"),
        q6(col("n_treated").cast("double") /
          (col("n_treated") + col("n_control")).cast("double"))
          .as("share_treated"),
        (col("n_treated") > 0 && col("n_control") > 0)
          .as("positivity_ok"))
  }

  /** F65a: INVERSE-PROPENSITY-WEIGHTED ATE (Horvitz–Thompson 1952
    * weighting; Hájek-stabilized ratio form — the variant that stays
    * bounded when weights are noisy): with t ∈ {0,1}, outcome y and a
    * caller-fitted propensity e = P(t=1|x),
    * `ATE = Σ(t·y/e)/Σ(t/e) − Σ((1−t)·y/(1−e))/Σ((1−t)/(1−e))`.
    *
    * Determinism: each per-row weighted term is a fixed IEEE tree, then
    * floor-scaled to 1e6 and summed as DECIMAL(38,0) — the estimator is
    * DEFINED on 1e-6-quantized terms, so the four sums are exact and
    * order-free at any row count (a raw double Σ re-orders under
    * partitioning). One aggregate pass; output 1 row:
    * (n, n_treated, mu_treated, mu_control, ate_ipw). */
  def ipwAte(df: DataFrame, y: Column, treated: Column,
      propensity: Column): DataFrame = {
    val rows = df.select(y.cast("double").as("__y"),
      treated.cast("int").as("__t"),
      propensity.cast("double").as("__e"))
    requireValidPropensity(rows, "ipwAte")
    val D = "decimal(38,0)"
    def s6(c: Column) = sum(floor(c * lit(1e6) + lit(0.5)).cast(D))
    val tD = col("__t").cast("double")
    val agg = rows.agg(
      count(lit(1)).as("n"),
      coalesce(sum(col("__t").cast("long")), lit(0L)).as("n_treated"),
      s6(tD * col("__y") / col("__e")).as("__ny1"),
      s6(tD / col("__e")).as("__dw1"),
      s6((lit(1.0) - tD) * col("__y") / (lit(1.0) - col("__e")))
        .as("__ny0"),
      s6((lit(1.0) - tD) / (lit(1.0) - col("__e"))).as("__dw0"))
    val mu1 = col("__ny1").cast("double") / col("__dw1").cast("double")
    val mu0 = col("__ny0").cast("double") / col("__dw0").cast("double")
    agg.select(col("n"), col("n_treated"),
      graft.functions.q6(when(col("__dw1") > 0, mu1)).as("mu_treated"),
      graft.functions.q6(when(col("__dw0") > 0, mu0)).as("mu_control"),
      graft.functions.q6(when(col("__dw1") > 0 && col("__dw0") > 0,
        mu1 - mu0)).as("ate_ipw"))
  }

  /** F65b: DOUBLY-ROBUST (AIPW) ATE (Robins, Rotnitzky & Zhao 1994):
    * augments IPW with caller-fitted outcome-model predictions m1 =
    * Ê[y|t=1,x], m0 = Ê[y|t=0,x] — consistent if EITHER the propensity
    * OR the outcome model is right. Per-row influence term
    * `(m1 − m0) + t·(y − m1)/e − (1−t)·(y − m0)/(1−e)`, floor-scaled to
    * 1e6 and DECIMAL-summed (order-free), divided by n once. Output
    * 1 row: (n, n_treated, ate_model, ate_aipw) — `ate_model` is the
    * plain outcome-model mean difference for comparison. */
  def aipwAte(df: DataFrame, y: Column, treated: Column,
      propensity: Column, m1: Column, m0: Column): DataFrame = {
    val rows = df.select(y.cast("double").as("__y"),
      treated.cast("int").as("__t"),
      propensity.cast("double").as("__e"),
      m1.cast("double").as("__m1"), m0.cast("double").as("__m0"))
    requireValidPropensity(rows, "aipwAte")
    val D = "decimal(38,0)"
    def s6(c: Column) = sum(floor(c * lit(1e6) + lit(0.5)).cast(D))
    val tD = col("__t").cast("double")
    val term = (col("__m1") - col("__m0")) +
      tD * (col("__y") - col("__m1")) / col("__e") -
      (lit(1.0) - tD) * (col("__y") - col("__m0")) /
        (lit(1.0) - col("__e"))
    val agg = rows.agg(
      count(lit(1)).as("n"),
      coalesce(sum(col("__t").cast("long")), lit(0L)).as("n_treated"),
      s6(col("__m1") - col("__m0")).as("__sm"),
      s6(term).as("__st"))
    val nD = col("n").cast("double")
    agg.select(col("n"), col("n_treated"),
      graft.functions.q6(col("__sm").cast("double") / lit(1e6) / nD)
        .as("ate_model"),
      graft.functions.q6(col("__st").cast("double") / lit(1e6) / nD)
        .as("ate_aipw"))
  }
}
