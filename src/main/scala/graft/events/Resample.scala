package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: per-entity calendar-spine resampling with
  * forward fill.
  *
  * Feature pipelines want one row per (entity, day) even when the raw
  * event stream skips days — "last observed value carries forward". The
  * textbook encoding is a calendar-spine table joined against the
  * observations plus a `last(_, ignoreNulls)` window — two shuffles and
  * a join whose spine side is |entities| × |days| rows BEFORE the fill.
  *
  * The segment-explode form here needs NO spine and no ignoreNulls scan:
  * after the per-(entity, day) aggregate, each observed day looks at the
  * NEXT observed day (`lead` over the entity window) and emits itself
  * plus its gap days via `sequence(day, next−1)` — the filled value is
  * the segment's own value by construction. Row count materializes
  * directly to the output size; nothing is shuffled at spine
  * granularity (the explode happens after the last exchange).
  *
  * At 100 TB: one exchange for the (entity, day) aggregate, one for the
  * entity window — both key-sized; the explode is map-side. A hot
  * entity costs its own output rows, never a joined spine. */
object Resample {

  /** Daily resample of `valueCol` aggregated by `aggFn` per (key, day),
    * gaps forward-filled from the previous observed day. Output: key,
    * `day` (date), `value`, `filled` (0 = observed, 1 = carried). The
    * series spans each key's first to last observed day — leading gaps
    * have nothing to carry and trailing fill would never terminate. */
  def dailyResampleFfill(df: DataFrame, key: String, ts: Column,
      valueCol: Column, aggFn: Column => Column = sum): DataFrame = {
    val daily = df
      .groupBy(col(key), to_date(ts).as("__d"))
      .agg(round(aggFn(valueCol), 2).as("value"))
    val w = Window.partitionBy(col(key)).orderBy(col("__d"))
    daily
      .withColumn("__next", lead(col("__d"), 1).over(w))
      .select(col(key), col("__d"), col("value"),
        explode(sequence(col("__d"),
          coalesce(date_sub(col("__next"), 1), col("__d")))).as("day"))
      .select(col(key), col("day"), col("value"),
        (col("day") =!= col("__d")).cast("int").as("filled"))
  }
}
