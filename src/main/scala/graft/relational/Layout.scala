package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-column data-skipping
  * primitive (public knowledge: Morton 1966; the technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`). Linear sort on one column gives
  * parquet min/max pruning on that column only; interleaving the bits
  * of two quantized dimensions makes every contiguous z-range a small
  * RECTANGLE in (x, y) space, so per-file min/max footers stay tight on
  * BOTH columns and a box predicate prunes files on either dimension.
  *
  * At 100 TB this is a write-side layout choice, not a query operator:
  * one `repartitionByRange` shuffle on the z-value at write time buys
  * every subsequent scan file-level pruning on both dimensions. All
  * z-value arithmetic is integer/bit Column expressions (codegen'd,
  * engine-reproducible — the DuckDB oracle recomputes it bit-for-bit).
  */
object Layout {

  /** Spread the low 16 bits of `c` into the even bit positions (Morton
    * magic-mask sequence). */
  private def spread16(c: Column): Column = {
    val a = c.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x33333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Quantize `v` into [0, 65535] given its global min/max. Exact while
    * `(v − vMin) · 65535 < 2^53` (range width < ~2^37) — the double
    * product and division below are then IEEE-exact, so independent
    * engines agree on every cell. Degenerate ranges map to 0. */
  def quantize16(v: Column, vMin: Column, vMax: Column): Column =
    when(vMax > vMin,
      floor((v - vMin).cast("double") * 65535.0 /
        (vMax - vMin).cast("double")).cast("long"))
      .otherwise(lit(0L))

  /** The 32-bit Morton code of two 16-bit-quantized dimensions. */
  def zValue(x16: Column, y16: Column): Column =
    spread16(x16).bitwiseOR(shiftleft(spread16(y16), 1))

  /** Layout audit: bucket rows into `buckets` equal-size z-ranges
    * (the SQL-standard ntile assignment under the total (z, tiebreak)
    * order) and report each bucket's (x, y) bounding box. Tight
    * per-bucket boxes are the data-skipping property itself — this is
    * the report the write path is judged by, computed identically by
    * the oracle. The min/max scan is one map-side-combined aggregate;
    * the ntile is COMPUTED from the two-phase prefix-sum rank
    * ([[Ranks.globalRank]]) — no global-order window, so the audit
    * runs on a production corpus, not just a sample. */
  def zOrderReport(df: DataFrame, xCol: String, yCol: String,
      tieCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val mm = df.agg(min(col(xCol)).as("__xmin"), max(col(xCol)).as("__xmax"),
      min(col(yCol)).as("__ymin"), max(col(yCol)).as("__ymax"))
    val z = df.crossJoin(broadcast(mm))
      .withColumn("__z", zValue(
        quantize16(col(xCol), col("__xmin"), col("__xmax")),
        quantize16(col(yCol), col("__ymin"), col("__ymax"))))
    val (ranked, n) = Ranks.globalRankAndCount(z,
      Seq(col("__z"), col(tieCol)), "__r")
    ranked
      .withColumn("bucket",
        Ranks.ntileOf(col("__r"), math.max(n, 1L), buckets))
      .groupBy(col("bucket").cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"))
  }

  /** Write `df` z-ordered on (xCol, yCol): one range shuffle on the
    * Morton code, files sorted within partitions so parquet row-group
    * and file footers carry tight min/max on BOTH dimensions. `nFiles`
    * sizes the output (at scale: total bytes / target file size). */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
      outDir: String, nFiles: Int): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val mm = df.agg(min(col(xCol)).as("__xmin"), max(col(xCol)).as("__xmax"),
      min(col(yCol)).as("__ymin"), max(col(yCol)).as("__ymax"))
    df.crossJoin(broadcast(mm))
      .withColumn("__z", zValue(
        quantize16(col(xCol), col("__xmin"), col("__xmax")),
        quantize16(col(yCol), col("__ymin"), col("__ymax"))))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__xmin", "__xmax", "__ymin", "__ymax")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Per-file (x, y) bounding boxes of a written directory — the
    * read-back view of what a scan's file-pruning would see. */
  def fileBoxes(spark: org.apache.spark.sql.SparkSession, dir: String,
      xCol: String, yCol: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"))
}
