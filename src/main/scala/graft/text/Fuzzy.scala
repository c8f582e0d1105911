package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X101: fuzzy-key matching via the SORTED-NEIGHBORHOOD method
  * (Hernández & Stolfo 1995, public knowledge) with a Levenshtein
  * verify — the classic record-linkage blocking: sort all keys once,
  * compare each key only against its `window` successors in sort
  * order, and keep pairs within `maxDist` edits. Near-identical keys
  * sort adjacently, so a small window catches typo-level variants
  * without ever forming the O(n²) pair space; the window size IS the
  * method's recall knob (documented, deterministic — the output is
  * defined BY the method, not approximated from "all pairs within k").
  *
  * Distributed shape: the global sort rank uses the two-phase form
  * (`repartitionByRange` → per-partition `row_number` + a
  * partitions-sized driver prefix of counts — the only thing collected
  * is one count per partition), NOT a single-partition window. The
  * neighborhood join is a rank-bucket band join: the left side lives
  * in bucket `rank div window`, the right side is duplicated into its
  * bucket and the previous one, so every |Δrank| ≤ window pair shares
  * exactly one bucket key — ONE equi-join, no range cross product.
  * The Levenshtein verify runs only inside the band, behind a cheap
  * length-difference prefilter (|len(a)−len(b)| > maxDist implies
  * edit distance > maxDist). */
object Fuzzy {

  /** Sorted-neighborhood fuzzy self-join. Output: (id_a, id_b, key_a,
    * key_b, dist) with rank(a) < rank(b) ≤ rank(a) + window and
    * `dist = levenshtein(key_a, key_b) <= maxDist`. Sort order is
    * (key, id) — total and engine-reproducible. */
  def sortedNeighborhoodJoin(df: DataFrame, idCol: String, key: Column,
      window: Int, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    neighborhoodCandidates(df, idCol, key, window)
      .filter(abs(length(col("key_a")) - length(col("key_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("key_a"), col("key_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("key_a"), col("key_b"),
        col("dist"))
  }

  /** X137: the same sorted-neighborhood blocking with a JARO–WINKLER
    * verify — the record-linkage comparator for NAME-typo variants
    * (transposed letters cost Levenshtein 2 but barely dent JW, and
    * JW's prefix boost matches how real name data corrupts). The
    * verify is the native codegen'd `graft_jw`
    * ([[graft.functions.JaroWinklerExpr]]) — the per-candidate hot
    * loop stays inside whole-stage codegen. Output: (id_a, id_b,
    * key_a, key_b, jw) with jw ≥ minSim, raw doubles (single IEEE
    * tree, no rounding needed — DuckDB's `jaro_winkler_similarity`
    * computes the identical value). */
  def jwNeighborhoodJoin(df: DataFrame, idCol: String, key: Column,
      window: Int, minSim: Double): DataFrame = {
    require(minSim > 0.0 && minSim <= 1.0,
      s"minSim must be in (0, 1], got $minSim")
    graft.functions.JaroWinklerExpr.register(df.sparkSession)
    neighborhoodCandidates(df, idCol, key, window)
      .withColumn("jw", call_function(graft.functions.JaroWinklerExpr.Name,
        col("key_a"), col("key_b")))
      .filter(col("jw") >= minSim)
      .select(col("id_a"), col("id_b"), col("key_a"), col("key_b"),
        col("jw"))
  }

  /** The shared banded candidate generator: every |Δrank| ≤ window
    * pair under the total (key, id) sort order, via the two-phase rank
    * + rank-bucket band join described above. */
  private def neighborhoodCandidates(df: DataFrame, idCol: String,
      key: Column, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val spark = df.sparkSession
    import spark.implicits._
    // materialize the derived key ONCE: repartitionByRange SAMPLES its
    // input to pick range bounds, so an uncached key expression (often
    // a regex over text) would run in the sampling pass, the partition
    // pass and the window materialization
    val keyed = graft.util.Caches.persistTracked(
      df.select(col(idCol).cast("long").as("id"), key.as("key")))
    val byPart = keyed
      .repartitionByRange(col("key"), col("id"))
      .withColumn("__pid", spark_partition_id())
    val inPart = Window.partitionBy(col("__pid"))
      .orderBy(col("key"), col("id"))
    val local = graft.util.Caches.persistTracked(
      byPart.withColumn("__rn", row_number().over(inPart)))
    // partition counts -> driver prefix sum (one long per partition)
    val counts = local.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__c")).as[(Int, Long)].collect().sortBy(_._1)
    val prefix = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _)).toMap
    val prefixDf = prefix.toSeq.toDF("__pid", "__prefix")
    val ranked = graft.util.Caches.persistTracked(
      local.join(broadcast(prefixDf), "__pid")
        .select(col("id"), col("key"),
          (col("__prefix") + col("__rn")).as("__rank")))
    val w = window.toLong
    val a = ranked.select(col("id").as("id_a"), col("key").as("key_a"),
      col("__rank").as("rank_a"), expr(s"__rank DIV $w").as("__b"))
    val b = ranked.select(col("id").as("id_b"), col("key").as("key_b"),
        col("__rank").as("rank_b"),
        explode(array(expr(s"__rank DIV $w"),
          expr(s"__rank DIV $w") - 1L)).as("__b"))
    a.join(b, Seq("__b"))
      .filter(col("rank_b") > col("rank_a") &&
        col("rank_b") <= col("rank_a") + w)
  }
}
