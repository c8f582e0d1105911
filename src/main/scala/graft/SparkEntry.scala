package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * `queries` is the operator inventory (one entry per implemented operator
  * from SURVEY.md §2, named `q_<operator-id>_<slug>`); `oracleSql` carries a
  * DuckDB-equivalent SQL text for every query that is SQL-expressible.
  * Query groups live under [[graft.queries]].
  */
object SparkEntry {

  /** Flagship: the SURVEY §7.2 "minimum end-to-end slice" — a snapshot
    * feature vector (latest value per feature as-of a date) enriched with
    * session counts, per user. Exercises scan → filter → window → agg →
    * pivot in one plan. Driver smoke-checks rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val events = Tables.t(spark, dir, "events")
    val vector = events.transform(
      graft.events.EventFunctions.snapshot(_, "2024-01-15 00:00:00",
        Seq("click", "error", "purchase", "signup", "view")))
    val sessions = graft.events.EventFunctions
      .sessionStats(events, 3600)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"))
    vector.join(sessions, Seq("user_id"), "left").orderBy(col("user_id"))
  }

  private val groups: Seq[(Map[String, (SparkSession, String) => DataFrame],
      Map[String, String])] = Seq(
    (graft.queries.RelationalQueries.queries, graft.queries.RelationalQueries.oracles),
    (graft.queries.EventQueries.queries, graft.queries.EventQueries.oracles),
    (graft.queries.Scd2Queries.queries, graft.queries.Scd2Queries.oracles),
    (graft.queries.TextQueries.queries, graft.queries.TextQueries.oracles),
    (graft.queries.AnnQueries.queries, graft.queries.AnnQueries.oracles),
    (graft.queries.StarQueries.queries, graft.queries.StarQueries.oracles),
    (graft.queries.DqQueries.queries, graft.queries.DqQueries.oracles),
    (graft.queries.PipelineQueries.queries, graft.queries.PipelineQueries.oracles),
    (graft.queries.GraphQueries.queries, graft.queries.GraphQueries.oracles),
    (graft.queries.MultimodalQueries.queries, graft.queries.MultimodalQueries.oracles),
    (graft.queries.FeatureQueries.queries, graft.queries.FeatureQueries.oracles),
    (graft.queries.LabelingQueries.queries, graft.queries.LabelingQueries.oracles))

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted ⇒ driver records rows-only check. */
  def oracleSql: Map[String, String] =
    groups.map(_._2).reduce(_ ++ _)
}
