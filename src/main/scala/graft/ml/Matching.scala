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
    * columns named by the caller. Scores must be non-null doubles. */
  def caliperMatch(treated: DataFrame, control: DataFrame,
      caliper: Double): DataFrame = {
    require(caliper > 0, s"caliper must be > 0, got $caliper")
    val t = treated.select(col("id").as("t_id"),
      col("score").cast("double").as("t_score"),
      col("y").as("t_y"))
      .filter(col("t_score").isNotNull)
    val c = control.select(col("id").as("c_id"),
      col("score").cast("double").as("c_score"),
      col("y").as("c_y"))
      .filter(col("c_score").isNotNull)
      .withColumn("__bin", floor(col("c_score") / lit(caliper)))
    val tBinned = t
      .withColumn("__b0", floor(col("t_score") / lit(caliper)))
      .withColumn("__bin", explode(array(col("__b0") - 1, col("__b0"),
        col("__b0") + 1)))
      .drop("__b0")
    val pairs = tBinned.join(c, Seq("__bin"))
      .withColumn("dist", abs(col("t_score") - col("c_score")))
      .filter(col("dist") <= lit(caliper))
    val w = Window.partitionBy(col("t_id"))
      .orderBy(col("dist"), col("c_score"), col("c_id"))
    pairs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("t_id"), col("t_score"), col("t_y"),
        col("c_id"), col("c_score"), col("c_y"),
        graft.functions.q6(col("dist")).as("dist"))
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
