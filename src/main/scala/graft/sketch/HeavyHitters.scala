package graft.sketch

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries frequent-items summary (Misra & Gries 1982), mergeable in
  * the Agarwal et al. 2012 "Mergeable Summaries" sense: `k` counters per
  * aggregation buffer, combine = counter-wise sum followed by subtracting
  * the (k+1)-th largest count — the result carries the same guarantee as
  * a single-pass summary. The guarantee that matters downstream: every
  * item with true frequency > n/k IS present in the final summary
  * (counts may be under-estimates; the summary may also hold colder
  * items). The summary is therefore a CANDIDATE set, never the answer —
  * [[HeavyHitters.heavyHitters]] re-counts candidates exactly and
  * filters, making the final output deterministic and oracle-checkable.
  *
  * 100 TB shape: the buffer is bounded at `k` entries per group no
  * matter the corpus size, partial-aggregates map-side, and only
  * `≤ k · |groups|` candidate rows ever reach the driver-visible side of
  * the plan. The naive alternative — `groupBy(group, token).count()`
  * over the raw corpus — shuffles one row per DISTINCT (group, token)
  * pair, billions at 100 TB; here the exact re-count pass is restricted
  * to candidate tokens first, so its shuffle carries at most
  * `k · |groups|` distinct keys after map-side combine.
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"k must be at least 1, got $k")

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    if (tok == null) b
    else b.get(tok) match {
      case Some(c) => b.updated(tok, c + 1)
      case None if b.size < k => b.updated(tok, 1L)
      // Classic MG step: a full table and an unseen item decrement every
      // counter; zeroed counters free their slots.
      case None => b.collect { case (t, c) if c > 1 => t -> (c - 1) }
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    MisraGries.mergeSummaries(a, b, k)

  def finish(b: Map[String, Long]): Map[String, Long] = b
  def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object MisraGries {
  /** Combine two MG summaries at capacity `k` (Agarwal et al. 2012):
    * counter-wise sum, then subtract the (k+1)-th largest count and
    * drop non-positive — preserves the n/k no-false-negative guarantee
    * across arbitrary merge trees, INCLUDING summaries persisted to
    * storage and merged later. */
  def mergeSummaries(a: Map[String, Long], b: Map[String, Long],
      k: Int): Map[String, Long] = {
    val m = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (m.size <= k) m
    else {
      val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      m.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }
}

/** Aggregator over ALREADY-BUILT MG summaries (map rows read back from
  * a sketch table) — the merge half of the persisted-summary pattern. */
class MisraGriesMerge(k: Int)
    extends Aggregator[Map[String, Long], Map[String, Long],
      Map[String, Long]] {
  require(k >= 1, s"k must be at least 1, got $k")
  def zero: Map[String, Long] = Map.empty
  def reduce(b: Map[String, Long], in: Map[String, Long]): Map[String, Long] =
    MisraGries.mergeSummaries(b, if (in == null) Map.empty else in, k)
  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    MisraGries.mergeSummaries(a, b, k)
  def finish(b: Map[String, Long]): Map[String, Long] = b
  def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object HeavyHitters {

  /** Per-group heavy hitters: every `tokenCol` value whose exact group
    * frequency strictly exceeds `n_group / k`, with its exact count and
    * share. Two passes, neither of which shuffles raw distinct tokens:
    *
    *  1. CANDIDATES — one Misra–Gries aggregate per group (bounded `k`
    *     counters, map-side combinable). The MG guarantee makes this a
    *     superset of the true answer.
    *  2. EXACT RE-COUNT — corpus tokens semi-joined (broadcast; the
    *     candidate table is ≤ k·|groups| rows) to the candidates, then
    *     counted exactly and filtered with INTEGER arithmetic
    *     (`count · k > n`), so the threshold is engine-exact.
    *
    * The output is deterministic — partitioning affects which cold items
    * ride along in the MG summary, never the filtered result. */
  def heavyHitters(df: DataFrame, groupCol: String, tokenCol: String,
      k: Int): DataFrame = {
    val mg = udaf(new MisraGries(k), Encoders.STRING)
    val toks = df.select(col(groupCol), col(tokenCol))
    val cand = toks.groupBy(col(groupCol))
      .agg(mg(col(tokenCol)).as("__mg"), count(col(tokenCol)).as("n_group"))
    val candTokens = cand
      .select(col(groupCol), col("n_group"),
        explode(map_keys(col("__mg"))).as(tokenCol))
    val exact = toks
      .join(broadcast(candTokens), Seq(groupCol, tokenCol))
      .groupBy(col(groupCol), col(tokenCol), col("n_group"))
      .agg(count(lit(1)).as("tok_count"))
    exact.filter(col("tok_count") * k > col("n_group"))
      .select(col(groupCol), col(tokenCol), col("tok_count"),
        col("n_group"),
        graft.functions.q6(col("tok_count").cast("double") / col("n_group"))
          .as("share"))
  }

  /** Per-group MG summary TABLE — the persistable form (one map column
    * of ≤ k counters per group, plus the group's token total). Sketch
    * tables written per batch/day merge later via
    * [[mergedCandidates]] without touching raw data. */
  def summaries(df: DataFrame, groupCol: String, tokenCol: String,
      k: Int): DataFrame = {
    val mg = udaf(new MisraGries(k), Encoders.STRING)
    df.groupBy(col(groupCol))
      .agg(mg(col(tokenCol)).as("mg_summary"),
        count(col(tokenCol)).as("n_tokens"))
  }

  /** Merge persisted summary rows back into per-group candidates:
    * (group, token, lb_count, n_tokens) where `lb_count` is the merged
    * MG counter (a LOWER bound on the true count; true count ≤
    * lb_count + Σn/k). The guarantee that survives storage: any token
    * with true frequency > Σn/k appears here. */
  def mergedCandidates(summaryRows: DataFrame, groupCol: String,
      k: Int): DataFrame = {
    val mgm = udaf(new MisraGriesMerge(k),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Map[String, Long]]())
    val merged = summaryRows.groupBy(col(groupCol))
      .agg(mgm(col("mg_summary")).as("__m"),
        sum(col("n_tokens")).as("n_tokens"))
    merged.select(col(groupCol), explode(col("__m"))
        .as(Seq("token", "lb_count")), col("n_tokens"))
      .select(col(groupCol), col("token"), col("lb_count"),
        col("n_tokens"))
  }
}
