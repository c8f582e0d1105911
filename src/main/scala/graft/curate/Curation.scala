package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators (north-star scope; no counterpart in
  * the reference): deterministic stratified sampling for class balancing
  * and token-budget sequence packing for context-window construction.
  *
  * Both are single-pass column/window expressions — no driver state, no
  * RNG: sampling decisions and pack boundaries are pure functions of the
  * row, so reruns are idempotent, results are engine-reproducible (DuckDB
  * oracle), and adding data never reshuffles previous decisions.
  */
object Curation {

  /** Uniform-in-[0,1) per row: first 8 md5 hex digits of (seed, id) over
    * 2^32. Deterministic, uniform, and independent across seeds. */
  def uniformHash(idCol: Column, seed: String): Column =
    conv(substring(md5(concat_ws(":", lit(seed), idCol.cast("string"))), 1, 8),
      16, 10).cast("double") / lit(4294967296.0)

  /** X12: deterministic stratified sampling — keep a row of stratum `s`
    * when its [0,1) hash falls under `fractions(s)` (strata absent from
    * the map are dropped). The classic class-balancing primitive for
    * training mixes, as a pure filter: one scan, no shuffle, reproducible
    * row-for-row from (seed, id) alone — unlike `sampleBy`, whose RNG is
    * partition-layout-dependent and not mirrorable across engines. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], seed: String): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(uniformHash(col(idCol), seed) < frac)
  }

  /** X13: sequence packing — lay documents out in (`shardCol`,
    * `orderCol`) order as one token stream per shard and cut context
    * windows of `tokenBudget` tokens; a document belongs to the pack
    * where its FIRST token lands (`pack_id`), with `pack_offset` giving
    * its start position inside the pack. This is the
    * concatenate-then-chunk packing LLM pretraining uses (documents may
    * straddle a boundary; the consumer decides whether to split or drop
    * the tail).
    *
    * The running sum is a window per SHARD: shards pack independently, so
    * the operator scales by adding shards — a global ordering would be a
    * single-partition bottleneck at 100 TB. Pack ids are therefore only
    * unique per shard; (shard, pack_id) is the global key. */
  def packSequences(df: DataFrame, tokenCountCol: String, shardCol: String,
      orderCol: String, tokenBudget: Long): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokenCountCol)).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col(tokenCountCol)) / tokenBudget).cast("long"))
      .withColumn("pack_offset",
        (col("__cum") - col(tokenCountCol)) % tokenBudget)
      .drop("__cum")
  }
}
