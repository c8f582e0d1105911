package graft.dq

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality engine with the semantics of the reference's TopNotch
  * integration (SURVEY.md §2.13; behaviour spec reference:
  * docs/dq_testing.md:1-193, invocation DQTestSpec.scala:16-31):
  * assertions (valid-row predicate + failure threshold), diffs (row
  * comparison over join keys), views (named SQL), and plans (an ordered
  * command list with outputs feeding later inputs).
  *
  * Scale: an assertion is ONE aggregate pass — total and invalid counts
  * come from the same `count(when(...))` aggregation, not two `count()`
  * jobs over the same lineage; the invalid-row DataFrame is a lazy filter
  * the caller only pays for when it materializes the report.
  */
object Dq {

  /** D1 assertion outcome. `invalidRows` is lazy. */
  case class AssertionResult(
      validWhere: String,
      threshold: Double,
      total: Long,
      invalid: Long,
      ratio: Double,
      passed: Boolean,
      invalidRows: DataFrame)

  /** D1: rows NOT satisfying `validWhere` are invalid; the assertion fails
    * when their fraction exceeds `threshold`. A row whose predicate
    * evaluates to NULL (e.g. a NULL in the checked column) does NOT satisfy
    * it and counts as invalid — the reference spec says a row is invalid
    * "if it does not pass the query clause" (docs/dq_testing.md), so
    * NULL-predicate rows must not silently pass the gate. Hence invalid =
    * total − count(predicate true), not count(NOT predicate). */
  def assertion(df: DataFrame, validWhere: String,
      threshold: Double): AssertionResult = {
    val bad = !coalesce(expr(validWhere), lit(false))
    val row = df.agg(
      count(lit(1)).as("total"),
      count(when(expr(validWhere), 1)).as("valid")).head()
    val (total, invalid) = (row.getLong(0), row.getLong(0) - row.getLong(1))
    val ratio = if (total == 0) 0.0 else invalid.toDouble / total
    AssertionResult(validWhere, threshold, total, invalid, ratio,
      ratio <= threshold, df.filter(bad))
  }

  /** D2: join `left`/`right` on `joinCols` and compare `compareCols`;
    * returns only rows where any compared column differs, with both sides
    * and a per-column match flag. Null-safe equality (`<=>`). */
  def diff(left: DataFrame, right: DataFrame, joinCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val l = left.select((joinCols ++ compareCols).map(col): _*)
    val r = compareCols.foldLeft(
      right.select((joinCols ++ compareCols).map(col): _*)) {
      (d, c) => d.withColumnRenamed(c, s"${c}_right")
    }
    val joined = l.join(r, joinCols)
    val flagged = compareCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"${c}_match", col(c) <=> col(s"${c}_right"))
    }
    flagged.filter(compareCols.map(c => !col(s"${c}_match")).reduce(_ || _))
  }

  /** D3: named SQL over previously registered temp views. */
  def view(spark: SparkSession, sql: String): DataFrame = spark.sql(sql)

  /** D4 plan commands. `input`/`output` keys address the plan context. */
  sealed trait Command { def output: String }
  case class AssertCmd(input: String, validWhere: String, threshold: Double,
      output: String) extends Command
  case class DiffCmd(leftInput: String, rightInput: String,
      joinCols: Seq[String], compareCols: Seq[String],
      output: String) extends Command
  case class ViewCmd(sql: String, output: String) extends Command

  /** D4: run commands in order; each output becomes addressable by later
    * commands and is registered as a temp view for ViewCmd SQL. Assertion
    * outputs are one-row summary frames (the invalid rows are registered
    * under `<output>_invalid`). Outputs named in `cacheKeys` are cached AS
    * CREATED, so later commands that reuse them don't recompute their
    * lineage — the point of the reference plan format's `cache` flag. */
  def runPlan(spark: SparkSession, commands: Seq[Command],
      inputs: Map[String, DataFrame],
      cacheKeys: Set[String] = Set.empty): Map[String, DataFrame] = {
    inputs.foreach { case (k, df) => df.createOrReplaceTempView(k) }
    commands.foldLeft(inputs) { (ctx, cmd) =>
      val out0 = cmd match {
        case AssertCmd(in, where, thr, _) =>
          val r = assertion(ctx(in), where, thr)
          ctx(in).sparkSession.range(1).select(
            lit(r.total).as("total"), lit(r.invalid).as("invalid"),
            round(lit(r.ratio), 6).as("ratio"), lit(r.passed).as("passed"))
        case DiffCmd(li, ri, jc, cc, _) => diff(ctx(li), ctx(ri), jc, cc)
        case ViewCmd(sql, _) => view(spark, sql)
      }
      val out = if (cacheKeys.contains(cmd.output)) out0.cache() else out0
      out.createOrReplaceTempView(cmd.output)
      val extra = cmd match {
        case AssertCmd(in, where, _, o) =>
          // NULL-predicate rows are invalid too (see assertion scaladoc)
          val inv = ctx(in).filter(!coalesce(expr(where), lit(false)))
          inv.createOrReplaceTempView(s"${o}_invalid")
          Map(s"${o}_invalid" -> inv)
        case _ => Map.empty[String, DataFrame]
      }
      ctx ++ extra + (cmd.output -> out)
    }
  }
}
