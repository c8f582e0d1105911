package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table access over a scale-factor directory (see TESTDATA.md). */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // The driver's events table stores ts as parquet TIMESTAMP(NANOS), which
    // Spark has no native type for (PARQUET_TYPE_ILLEGAL). Read nanos as
    // long (legacy flag set below) and floor-divide to microseconds — the
    // same truncation DuckDB applies when reading NANOS into its µs
    // timestamps, so oracle comparisons stay exact.
    if (df.schema.exists(f => f.name == "ts" && f.dataType ==
        org.apache.spark.sql.types.LongType))
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Must be set before any read of a NANOS-timestamp parquet. */
  def configure(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
}
