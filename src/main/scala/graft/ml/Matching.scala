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
}
