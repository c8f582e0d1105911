package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase GLOBAL-ORDER primitives — ranks and running totals over a
  * total order without ever moving the data to one partition.
  *
  * `Window.orderBy(...)` with no partition spec is the classic
  * scale-killer: Spark warns "Moving all data to a single partition"
  * and the whole relation funnels through one task. The scale-safe
  * shape (the same one [[graft.curate.Curation.contextManifest]] and
  * [[graft.text.Fuzzy]] use) is:
  *
  *   1. `repartitionByRange(orderCols)` — range-ordered partitions,
  *      each sorted locally by the window;
  *   2. within-partition cumulative sums run in PARALLEL;
  *   3. only the per-partition TOTALS (rows = #partitions, never data
  *      rows) are collected, prefix-summed on the driver, and
  *      broadcast-joined back.
  *
  * The result is partition-boundary-invariant: each row's prefix is
  * the sum over all order-smaller rows however they are split
  * (spec-proven under permuted partitionings).
  *
  * Sums are restricted to LONG columns — integer addition is exact and
  * associative, so the two-phase decomposition cannot change the
  * result (double sums would re-order additions). */
object Ranks {

  /** Adds, for every `(name, expr)` in `sums`, a column `name` holding
    * the cumulative LONG sum of `expr` over the total order
    * `orderCols` (rows up to and INCLUDING this one). `orderCols` may
    * use `.desc`. Input columns are preserved; the relation is
    * returned range-partitioned by `orderCols`. */
  def prefixSums(df: DataFrame, orderCols: Seq[Column],
      sums: Seq[(String, Column)]): DataFrame =
    prefixSumsWithTotals(df, orderCols, sums)._1

  /** [[prefixSums]] that also returns the GRAND TOTAL of each sum
    * column — the driver already holds the per-partition totals for
    * the prefix broadcast, so callers that need n / ΣnX (quantile
    * edges, ntile cuts, KS totals) get them for free instead of
    * paying a separate count/agg job. */
  def prefixSumsWithTotals(df: DataFrame, orderCols: Seq[Column],
      sums: Seq[(String, Column)]): (DataFrame, Seq[Long]) = {
    require(sums.nonEmpty, "prefixSums: no sum columns requested")
    val spark = df.sparkSession
    val part = df.repartitionByRange(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    val inPart = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = sums.foldLeft(part) { case (d, (name, c)) =>
      d.withColumn(s"__loc_$name", sum(c.cast("long")).over(inPart))
    }
    val cached = graft.util.Caches.persistTracked(withLocal)
    // phase 2: per-partition totals — rows = #partitions, not data
    val aggs = sums.map { case (name, c) =>
      coalesce(sum(c.cast("long")), lit(0L)).as(s"__tot_$name")
    }
    val totals = cached.groupBy(col("__pid"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => r.getInt(0) -> sums.indices.map(j => r.getLong(j + 1)))
      .sortBy(_._1)
    val prefixRows = totals.map(_._1).zip(
      totals.map(_._2).scanLeft(sums.indices.map(_ => 0L)) {
        (acc, t) => acc.zip(t).map { case (a, b) => a + b }
      })
      .map { case (pid, pre) =>
        org.apache.spark.sql.Row.fromSeq(pid +: pre) }
    val prefixDf = spark.createDataFrame(
      spark.sparkContext.parallelize(prefixRows.toSeq, 1),
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("__pid",
          org.apache.spark.sql.types.IntegerType) +:
          sums.map { case (name, _) =>
            org.apache.spark.sql.types.StructField(s"__pre_$name",
              org.apache.spark.sql.types.LongType)
          }))
    val joined = cached.join(broadcast(prefixDf), "__pid")
    val withOut = sums.foldLeft(joined) { case (d, (name, _)) =>
      d.withColumn(name, col(s"__pre_$name") + col(s"__loc_$name"))
    }
    val temps = "__pid" +: sums.flatMap { case (name, _) =>
      Seq(s"__loc_$name", s"__pre_$name") }
    val grand = sums.indices.map(j => totals.map(_._2(j)).sum)
    (withOut.drop(temps: _*), grand)
  }

  /** Adds `rankName`: the 1-based global rank of each row in the total
    * order `orderCols` (ties — callers pass a tiebreaking suffix —
    * receive arbitrary but distinct ranks). */
  def globalRank(df: DataFrame, orderCols: Seq[Column],
      rankName: String): DataFrame =
    prefixSums(df, orderCols, Seq(rankName -> lit(1L)))

  /** [[globalRank]] plus the row count, with no extra job. */
  def globalRankAndCount(df: DataFrame, orderCols: Seq[Column],
      rankName: String): (DataFrame, Long) = {
    val (d, totals) =
      prefixSumsWithTotals(df, orderCols, Seq(rankName -> lit(1L)))
    (d, totals.head)
  }

  /** SQL-standard `ntile(k)` bucket of a 1-based `rank` among `n` rows:
    * the first `n % k` buckets hold `n/k + 1` rows, the rest `n/k` —
    * exactly the built-in's assignment, computed from the global rank
    * instead of a global-order window. */
  def ntileOf(rank: Column, n: Long, k: Int): Column = {
    require(k >= 1, s"ntileOf: k must be >= 1, got $k")
    require(n >= 1, s"ntileOf: n must be >= 1, got $n")
    val q = n / k
    val rem = n % k
    val cut = rem * (q + 1)
    // Column `/` is double division; floor() recovers the integral
    // quotient (exact for ranks < 2^53)
    when(rank <= cut, floor((rank + lit(q)) / lit(q + 1)))
      .otherwise(lit(rem) + floor((rank - lit(cut) + lit(q - 1)) /
        lit(math.max(q, 1L))))
  }
}
