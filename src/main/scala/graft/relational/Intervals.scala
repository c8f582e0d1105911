package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval analytics without pair explosion.
  *
  * The naive encoding of "how many pairs of intervals overlap, per key"
  * is a per-key self-join with a range predicate — O(n²) pair space per
  * key, which on a 100 TB event table with hot keys is the single worst
  * plan Spark can produce (a nested-loop inside a skewed shuffle
  * partition). The sweep-line form below is the classic computational-
  * geometry alternative: sort each key's interval endpoints once and
  * count co-open intervals as the sweep passes each start. O(n log n)
  * total, ONE shuffle (the per-key sort window), zero joins, and the
  * aggregate after the window reuses the window's partitioning so no
  * second exchange appears.
  */
object Intervals {

  /** Count, per key, the unordered pairs of overlapping intervals.
    *
    * Overlap is half-open: `[s₁,e₁)` and `[s₂,e₂)` overlap iff
    * `s₁ < e₂ AND s₂ < e₁` — touching endpoints (e₁ == s₂) do NOT
    * overlap. Rows with NULL or empty (`end <= start`) intervals are
    * dropped (an empty interval overlaps nothing under this convention).
    *
    * Sweep argument: process endpoints in time order, ends before starts
    * at equal timestamps (the half-open convention). When a start is
    * processed, every interval currently open overlaps the new one, so
    * the new interval contributes `running_open − 1` pairs (the −1 is
    * itself). Summing that contribution over all starts counts each
    * unordered pair exactly once — at whichever member starts later.
    * Ties need no deterministic order WITHIN a (ts, kind) group: k
    * starts at the same instant over a base of b open intervals
    * contribute b + (b+1) + … + (b+k−1) in any processing order.
    *
    * At 100 TB: the only data movement is one hash exchange on `keys`;
    * the window sort is per-partition, the final per-key sum is a
    * partial aggregate. A hot key costs one task a sort of its own rows
    * — linearithmic, not quadratic like the self-join it replaces. */
  def overlapPairCount(df: DataFrame, keys: Seq[String],
      start: Column, end: Column,
      resultCol: String = "overlap_pairs"): DataFrame = {
    val keyCols = keys.map(col)
    val base = df
      .filter(start.isNotNull && end.isNotNull && start < end)
    // Endpoint stream: (+1 at start, −1 at end); kind 0 = end sorts
    // before kind 1 = start at equal ts, so an interval ending exactly
    // when another starts is already closed when the start is counted.
    val points = base
      .select(keyCols :+ start.as("__t") :+ lit(1).as("__kind"): _*)
      .unionByName(
        base.select(keyCols :+ end.as("__t") :+ lit(0).as("__kind"): _*))
      .withColumn("__delta", when(col("__kind") === 1, 1L).otherwise(-1L))
    val sweep = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t"), col("__kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    points
      .withColumn("__open", sum(col("__delta")).over(sweep))
      .groupBy(keyCols: _*)
      .agg(sum(when(col("__kind") === 1, col("__open") - 1L)
        .otherwise(0L)).as(resultCol))
  }

  /** J15: STABBING COUNT — for each probe instant, how many of the
    * key's intervals cover it (`s ≤ p < e`, the half-open convention).
    * "How many shipments were in flight at this moment", the coverage
    * companion of [[overlapPairCount]] — and the same anti-join-shaped
    * trap: the naive encoding is a per-key range join (every point ×
    * every interval), O(n·m) pair space.
    *
    * Sweep form: starts (+1), ends (−1) and probes (0) merge into one
    * endpoint stream; a running sum ordered by (t, kind) with kind
    * start < end < probe reads the live coverage AT each probe — at an
    * equal timestamp a start counts (s ≤ p), an end has already
    * retired its interval (p < e fails at p = e). ONE key exchange,
    * zero joins; probes at the same (key, t) are deduplicated (they
    * read identical coverage by construction). Output: (keys..., t,
    * coverage). */
  def stabbingCount(intervals: DataFrame, keys: Seq[String],
      start: Column, end: Column, probes: DataFrame,
      probeT: Column): DataFrame = {
    val keyCols = keys.map(col)
    val base = intervals
      .filter(start.isNotNull && end.isNotNull && start < end)
    val points = probes.filter(probeT.isNotNull)
      .select(keyCols :+ probeT.as("__t"): _*).distinct()
      .withColumn("__kind", lit(2)).withColumn("__delta", lit(0L))
    val stream = base
      .select(keyCols :+ start.as("__t") :+ lit(0).as("__kind") :+
        lit(1L).as("__delta"): _*)
      .unionByName(base.select(keyCols :+ end.as("__t") :+
        lit(1).as("__kind") :+ lit(-1L).as("__delta"): _*))
      .unionByName(points)
    val sweep = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t"), col("__kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stream
      .withColumn("__open", sum(col("__delta")).over(sweep))
      .filter(col("__kind") === 2)
      .select(keyCols :+ col("__t").as("t") :+
        col("__open").as("coverage"): _*)
  }

  /** Reference implementation for specs: the O(n²) per-key self-join the
    * sweep replaces. `idCols` must uniquely identify a row. */
  def overlapPairCountNaive(df: DataFrame, keys: Seq[String],
      idCols: Seq[String], start: Column, end: Column,
      resultCol: String = "overlap_pairs"): DataFrame = {
    val base = df
      .filter(start.isNotNull && end.isNotNull && start < end)
      .select((keys ++ idCols).map(col) :+ start.as("__s") :+ end.as("__e"): _*)
    val a = base.as("a")
    val b = base.as("b")
    val pairId = (side: String) =>
      concat_ws("", idCols.map(c => col(s"$side.$c")): _*)
    a.join(b,
        keys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _) &&
          pairId("a") < pairId("b") &&
          col("a.__s") < col("b.__e") && col("b.__s") < col("a.__e"))
      .groupBy(keys.map(k => col(s"a.$k").as(k)): _*)
      .agg(count(lit(1)).as(resultCol))
  }
}
