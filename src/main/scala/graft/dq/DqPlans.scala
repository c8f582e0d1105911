package graft.dq

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** D4 CONFIG SURFACE: the reference's TopNotch JSON plan format, compiled
  * onto the existing [[Dq.Command]] ADT (reference shape:
  * docs/dq_testing.md:1-193, src/test/resources/testsuite/plan.json).
  *
  * A plan is `{"topnotch": [ <command>… ]}` where each command is one of
  *  - `{"command": "assertion", "externalParamsFile": …, "input":
  *    {"ref": …, "onDisk": bool, "delimiter"?}, "outputKey": …}` with
  *    params `{"topnotch": {"assertions": [{"query", "description",
  *    "threshold"}…]}}` — `query` is a SQL WHERE clause selecting VALID
  *    rows;
  *  - `{"command": "diff", "input1": …, "input2": …, "outputKey": …}` with
  *    params `{"topnotch": {"input1Columns": {"joinColumns", "diffColumns"},
  *    "input2Columns": …}}` — columns pair up POSITIONALLY and may be named
  *    differently on each side;
  *  - `{"command": "view", "inputs": [ … ], "outputKey": …}` with params
  *    `{"topnotch": {"tableAliases": […], "query": …}}`.
  *
  * Compilation is mechanical, one JSON command → one-or-more ADT commands:
  *  - each assertion entry becomes its own [[Dq.AssertCmd]] (`<key>__a<i>`),
  *    and a final [[Dq.ViewCmd]] UNION ALLs the one-row summaries into the
  *    command's `outputKey` report with `query`/`description`/`threshold`
  *    literal columns — the reference's per-command report shape. The
  *    per-assertion invalid rows stay addressable at `<key>__a<i>_invalid`.
  *  - a diff's second input is renamed to the first input's column names by
  *    a generated ViewCmd (positional mapping), then [[Dq.DiffCmd]] runs on
  *    the common names.
  *  - a view's inputs are exposed under their `tableAliases` before its SQL
  *    runs.
  *
  * On-disk refs load parquet (or delimited text when `delimiter` is set)
  * relative to `inputBase`; refs with `onDisk=false` address a previous
  * command's `outputKey`. `cache: true` caches the command output;
  * `outputPath` (resolved against `outputBase`) writes it as parquet —
  * both per the reference's plan semantics.
  */
object DqPlans {

  private val mapper = new ObjectMapper()

  private case class In(ref: String, onDisk: Boolean, delimiter: Option[String])

  /** A ref is addressed in generated SQL and as a temp view: collapse
    * non-identifier characters so path-like refs stay addressable. */
  private def viewName(ref: String): String = ref.replaceAll("\\W", "_")

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** An absent key AND an explicit JSON `null` both mean "not set"
    * (`asText()` on a NullNode would yield the string "null"). */
  private def optText(n: JsonNode): Option[String] =
    Option(n).filterNot(_.isNull).map(_.asText())

  private def parseIn(n: JsonNode): In = In(
    n.get("ref").asText(),
    n.has("onDisk") && n.get("onDisk").asBoolean(),
    optText(n.get("delimiter")))

  /** Run a TopNotch JSON plan. `params` resolves each command's
    * `externalParamsFile` NAME to its JSON content (use [[fromDirectory]]
    * for the reference's files-next-to-the-plan layout); `inputBase`
    * anchors on-disk input refs; `outputBase`, when set, anchors
    * `outputPath` parquet writes (left unset, nothing is written).
    * Returns the full plan context by output key, exactly like
    * [[Dq.runPlan]]. */
  def run(spark: SparkSession, planJson: String, params: String => String,
      inputBase: String = "", outputBase: Option[String] = None)
      : Map[String, DataFrame] = {
    val root = mapper.readTree(planJson)
    require(root != null && root.has("topnotch") && root.get("topnotch").isArray,
      "plan must be {\"topnotch\": [ …commands ]}")
    val cmdNodes = root.get("topnotch").elements().asScala.toSeq
    require(cmdNodes.nonEmpty, "a plan must contain at least one command")

    var inputs = Map.empty[String, DataFrame]
    var commands = Seq.empty[Dq.Command]
    // (outputKey, cache, outputPath) side-effect directives, applied after
    // the plan runs
    var directives = Seq.empty[(String, Boolean, Option[String])]

    def load(in: In): Unit = if (in.onDisk) {
      val path = if (in.ref.startsWith("/") || inputBase.isEmpty) in.ref
        else s"$inputBase/${in.ref}"
      val df = in.delimiter match {
        case Some(d) => spark.read.option("header", "true")
          .option("inferSchema", "true").option("sep", d).csv(path)
        case None => spark.read.parquet(path)
      }
      inputs += viewName(in.ref) -> df
    }

    def paramsOf(c: JsonNode): JsonNode = {
      val f = c.get("externalParamsFile").asText()
      val p = mapper.readTree(params(f))
      require(p != null && p.has("topnotch"),
        s"params file $f must be {\"topnotch\": …}")
      p.get("topnotch")
    }

    cmdNodes.foreach { c =>
      val out = c.get("outputKey").asText()
      c.get("command").asText() match {
        case "assertion" =>
          val in = parseIn(c.get("input")); load(in)
          val asserts = paramsOf(c).get("assertions").elements().asScala.toSeq
          require(asserts.nonEmpty, s"assertion command $out has no assertions")
          val keys = asserts.zipWithIndex.map { case (a, i) =>
            val k = s"${out}__a${i + 1}"
            commands :+= Dq.AssertCmd(viewName(in.ref), a.get("query").asText(),
              a.get("threshold").asDouble(), k)
            (k, a)
          }
          val report = keys.map { case (k, a) =>
            s"SELECT ${sqlLit(a.get("query").asText())} AS query, " +
              s"${sqlLit(Option(a.get("description")).map(_.asText()).getOrElse(""))} AS description, " +
              s"CAST(${a.get("threshold").asDouble()} AS DOUBLE) AS threshold, " +
              s"total, invalid, ratio, passed FROM $k"
          }.mkString("\nUNION ALL\n")
          commands :+= Dq.ViewCmd(report, out)
        case "diff" =>
          val in1 = parseIn(c.get("input1")); load(in1)
          val in2 = parseIn(c.get("input2")); load(in2)
          val p = paramsOf(c)
          def cols(side: String, kind: String): Seq[String] =
            p.get(side).get(kind).elements().asScala.toSeq.map(_.asText())
          val (j1, d1) = (cols("input1Columns", "joinColumns"),
            cols("input1Columns", "diffColumns"))
          val (j2, d2) = (cols("input2Columns", "joinColumns"),
            cols("input2Columns", "diffColumns"))
          require(j1.nonEmpty && j1.size == j2.size && d1.nonEmpty &&
            d1.size == d2.size,
            s"diff $out: join/diff column lists must be non-empty and pair up")
          // positional mapping: rename side 2 to side 1's names, then diff
          // on the (now common) names
          val renames = (j2.zip(j1) ++ d2.zip(d1))
            .map { case (from, to) => s"`$from` AS `$to`" }.mkString(", ")
          val in2view = s"${out}__in2"
          commands :+= Dq.ViewCmd(
            s"SELECT $renames FROM ${viewName(in2.ref)}", in2view)
          commands :+= Dq.DiffCmd(viewName(in1.ref), in2view, j1, d1, out)
        case "view" =>
          val ins = c.get("inputs").elements().asScala.toSeq.map(parseIn)
          ins.foreach(load)
          val p = paramsOf(c)
          val aliases = p.get("tableAliases").elements().asScala.toSeq
            .map(_.asText())
          require(aliases.size == ins.size,
            s"view $out: ${ins.size} inputs but ${aliases.size} tableAliases")
          ins.zip(aliases).foreach { case (in, a) =>
            if (viewName(in.ref) != a)
              commands :+= Dq.ViewCmd(s"SELECT * FROM ${viewName(in.ref)}", a)
          }
          commands :+= Dq.ViewCmd(p.get("query").asText(), out)
        case other =>
          throw new IllegalArgumentException(s"unknown command \"$other\"")
      }
      directives :+= ((out,
        c.has("cache") && c.get("cache").asBoolean(),
        optText(c.get("outputPath"))))
    }

    val cacheKeys = directives.collect { case (k, true, _) => k }.toSet
    val ctx = Dq.runPlan(spark, commands, inputs, cacheKeys)
    directives.foreach { case (key, _, outPath) =>
      for (base <- outputBase; p <- outPath) {
        // absolute outputPath is used verbatim, like absolute input refs
        val resolved = if (p.startsWith("/")) p else s"$base/$p"
        ctx(key).write.mode("overwrite").parquet(resolved)
      }
    }
    ctx
  }

  /** Param resolver reading `externalParamsFile` entries relative to the
    * plan's own directory — the reference's recommended layout. */
  def fromDirectory(dir: String): String => String = { name =>
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, name)), "UTF-8")
  }
}
