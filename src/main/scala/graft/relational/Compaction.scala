package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X141: SIZE-AWARE COMPACTION PLANNER — the small-file problem's
  * planning half (the reference's store rewrites to a FIXED file count,
  * `load/Scd2Store.compactHistory`; real lakehouse maintenance plans to
  * a TARGET BYTE SIZE, rewriting only what's needed — the OPTIMIZE
  * bin-packing idiom, public in the Delta/Iceberg literature).
  *
  * Files ordered by id are packed CONTIGUOUSLY: file f joins bin
  * `floor(prefix_bytes_before_f / targetBytes)` — each bin collects
  * files until its cumulative size crosses the target, so every bin
  * except possibly the last holds ≥ targetBytes, and no bin exceeds
  * `targetBytes + max single file − 1`. Contiguity preserves the id
  * (path/partition) order, so compaction never destroys range-scan
  * locality.
  *
  * Scale: the prefix sum is the two-phase [[Ranks.prefixSums]] (no
  * global-order window); bin assignment is exact LONG integer division
  * (`div` — no double rounding at any byte scale); the summary
  * aggregates bin-count rows. NULL sizes fail loud — a silently
  * dropped file would corrupt every later bin boundary. */
object Compaction {

  /** Per-file assignment: (id, bytes, bin). */
  def assignBins(files: DataFrame, idCol: String, bytesCol: Column,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    val f = files.select(col(idCol).as("id"),
      when(bytesCol.isNull, raise_error(lit(
        "compactionPlan: NULL file size — refusing to plan over " +
          "unknown bytes"))).otherwise(bytesCol.cast("long")).as("bytes"))
    Ranks.prefixSums(f, Seq(col("id")), Seq("__cum" -> col("bytes")))
      .select(col("id"), col("bytes"),
        expr(s"(__cum - bytes) div ${targetBytes}L").as("bin"))
  }

  /** Per-bin plan: (bin, n_files, bytes, first_id, last_id). */
  def compactionPlan(files: DataFrame, idCol: String, bytesCol: Column,
      targetBytes: Long): DataFrame =
    assignBins(files, idCol, bytesCol, targetBytes)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("bytes")).as("bytes"),
        min(col("id")).as("first_id"),
        max(col("id")).as("last_id"))
}
